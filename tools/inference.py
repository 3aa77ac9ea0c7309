#!/usr/bin/env python
"""Shim: the CLI lives at nv_wavenet_tpu.tools.inference (console script
nvw-inference); this path serves the documented `python tools/inference.py ...`
invocation without requiring an installed package."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nv_wavenet_tpu.tools.inference import main

if __name__ == "__main__":
    main()
