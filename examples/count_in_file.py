#!/usr/bin/env python
"""Per-database occurrence table (examples/count_in_file).

For every mer present in any of the given databases (which must share the
same k, size, and hash matrix — e.g. --disk intermediates), prints the mer
and its count in each database:

    python examples/count_in_file.py a.jf b.jf [...]
"""

import heapq
import sys

from jellyfish_tpu.io.files import DBReader
from jellyfish_tpu.mer import MerDNA


def main(argv):
    if len(argv) < 2:
        raise SystemExit(f"Usage: {argv[0]} db.jf [...]")
    readers = [DBReader(p) for p in argv[1:]]
    h0 = readers[0].header
    matrix = readers[0].matrix
    mask = h0.size - 1
    for r in readers[1:]:
        if r.header.key_len != h0.key_len or r.matrix != matrix:
            raise SystemExit("databases must share k and hash matrix")
    k = h0.key_len // 2

    def stream(i, reader):
        for key, val in reader:
            yield (matrix.times(key) & mask, key, i, val)

    merged = heapq.merge(*(stream(i, r) for i, r in enumerate(readers)))
    cur = None
    row = [0] * len(readers)
    for pos, key, i, val in merged:
        if cur is not None and key != cur:
            print(MerDNA(k, cur), *row)
            row = [0] * len(readers)
        cur = key
        row[i] = val
    if cur is not None:
        print(MerDNA(k, cur), *row)
    for r in readers:
        r.close()


if __name__ == "__main__":
    main(sys.argv)
