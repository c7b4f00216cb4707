"""-F concurrent multi-stream parsing parity (stream_manager.hpp role)."""

import numpy as np

from tests.conftest import oracle_counts, random_dna


def test_concurrent_files_match_serial(tmp_path, rng):
    from jellyfish_tpu.counter import MerCounter
    from jellyfish_tpu.io.parse import SequenceChunker

    paths = []
    all_seqs = []
    for i in range(6):
        seqs = [random_dna(rng, int(n)) for n in rng.integers(50, 400, 5)]
        p = str(tmp_path / f"f{i}.fa")
        with open(p, "w") as f:
            for j, s in enumerate(seqs):
                f.write(f">r{j}\n{s}\n")
        paths.append(p)
        all_seqs += seqs

    def count(nb_files):
        c = MerCounter(19, size=1 << 12, rng=np.random.default_rng(1))
        ch = SequenceChunker(paths, 19, 512, nb_files=nb_files)
        for chunk in ch.chunks():
            c.add_chunk(chunk)
        mers, counts = c.finalize()
        return {int(m): int(v) for m, v in zip(mers, counts)}, ch.reads

    serial, sreads = count(1)
    conc, creads = count(4)
    assert serial == conc == oracle_counts(all_seqs, 19, False)
    assert sreads == creads == len(all_seqs)
