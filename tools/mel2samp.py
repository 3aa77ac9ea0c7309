#!/usr/bin/env python
"""Shim: the CLI lives at nv_wavenet_tpu.tools.mel2samp (console script
nvw-mel2samp); this path serves the documented `python tools/mel2samp.py ...`
invocation without requiring an installed package."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nv_wavenet_tpu.tools.mel2samp import main

if __name__ == "__main__":
    main()
