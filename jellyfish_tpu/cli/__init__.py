"""`jellyfish` CLI: subcommand dispatcher (sub_commands/jellyfish.cc:47-72).

Usage: python -m jellyfish_tpu <count|bc|histo|dump|query|stats|merge|info|
mem|cite|generate> [options]
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    from jellyfish_tpu import __version__
    from jellyfish_tpu.cli import count, dbtools, tools

    parser = argparse.ArgumentParser(
        prog="jellyfish",
        description="TPU-native k-mer counter with Jellyfish capabilities",
    )
    parser.add_argument("--version", action="version",
                        version=f"jellyfish-tpu {__version__}")
    sub = parser.add_subparsers(dest="subcommand", required=True)

    count.add_parser(sub)
    tools.add_bc_parser(sub)
    # -h is a real flag for histo (high count); disable abbreviated help there
    p = dbtools.add_histo_parser(sub)
    dbtools.add_dump_parser(sub)
    dbtools.add_query_parser(sub)
    dbtools.add_stats_parser(sub)
    dbtools.add_merge_parser(sub)
    dbtools.add_info_parser(sub)
    tools.add_mem_parser(sub)
    tools.add_cite_parser(sub)
    tools.add_generate_parser(sub)
    tools.add_fastq2sam_parser(sub)
    return parser


def main(argv=None) -> int:
    import os
    import signal

    # behave like a unix tool when piped into head & co.
    try:
        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass

    # honor JAX_PLATFORMS even though the axon plugin overrides the env var
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.lower())

    # persistent XLA compile cache: the counting programs are identical
    # across runs per (k, chunk_len), so repeat invocations skip the
    # expensive first-compile entirely
    if not os.environ.get("JF_NO_COMPILE_CACHE"):
        import jax

        cache = os.environ.get(
            "JF_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "jellyfish_tpu", "xla"
            ),
        )
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass

    argv = list(sys.argv[1:] if argv is None else argv)
    parser = build_parser()
    args = parser.parse_args(argv)
    return args.func(args, argv)
