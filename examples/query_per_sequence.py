#!/usr/bin/env python
"""Per-sequence mer counts from a database (examples/query_per_sequence).

For each read of the given sequence files, prints the read header and the
database count of each of its mers:

    python examples/query_per_sequence.py db.jf reads.fa [...]
"""

import sys

import jellyfish_tpu as jellyfish
from jellyfish_tpu.io.parse import iter_reads, open_stream
from jellyfish_tpu.mer import string_mers


def main(argv):
    if len(argv) < 3:
        raise SystemExit(f"Usage: {argv[0]} db.jf file.fa [...]")
    db = jellyfish.QueryMerFile(argv[1])
    k = jellyfish.MerDNA.k()
    for path in argv[2:]:
        with open_stream(path) as stream:
            for i, seq in enumerate(iter_reads(stream)):
                print(f">read{i}")
                vals = []
                for m in string_mers(seq.decode(), k):
                    if db.canonical:
                        m.canonicalize()
                    vals.append(str(db[m]))
                print(" ".join(vals))


if __name__ == "__main__":
    main(sys.argv)
