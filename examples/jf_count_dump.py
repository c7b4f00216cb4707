#!/usr/bin/env python
"""Count k-mers of a FASTA/FASTQ file and dump them, all through the
library API (examples/jf_count_dump):

    python examples/jf_count_dump.py 21 reads.fa
"""

import sys

from jellyfish_tpu.counter import MerCounter
from jellyfish_tpu.io.parse import SequenceChunker
from jellyfish_tpu.mer import MerDNA


def main(argv):
    if len(argv) != 3:
        raise SystemExit(f"Usage: {argv[0]} <k> <sequence file>")
    k = int(argv[1])
    counter = MerCounter(k, size=1 << 20, canonical=True)
    for chunk in SequenceChunker([argv[2]], k, chunk_len=1 << 20).chunks():
        counter.add_chunk(chunk)
    for mer, count in zip(*counter.finalize()):
        print(MerDNA(k, int(mer)), int(count))


if __name__ == "__main__":
    main(sys.argv)
