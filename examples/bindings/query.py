#!/usr/bin/env python
"""Query mers from the command line through the Python scripting API (the
role of the reference's examples/swig/query.py).

    python examples/bindings/query.py counts.jf MER [MER...]
"""
import sys

import jellyfish_tpu as jellyfish

if len(sys.argv) < 3:
    sys.exit(f"usage: {sys.argv[0]} db.jf mer [mer...]")
q = jellyfish.QueryMerFile(sys.argv[1])
for m in sys.argv[2:]:
    print(m, q[jellyfish.MerDNA(m)])
