#!/usr/bin/env python
"""Dump every (mer, count) record through the Python scripting API (the
role of the reference's examples/swig/dump.py).

    python examples/bindings/dump.py counts.jf
"""
import sys

import jellyfish_tpu as jellyfish

if len(sys.argv) != 2:
    sys.exit(f"usage: {sys.argv[0]} db.jf")
for mer, count in jellyfish.ReadMerFile(sys.argv[1]):
    print(mer, count)
