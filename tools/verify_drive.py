#!/usr/bin/env python
"""Shim: the hardware verification drive lives at
nv_wavenet_tpu.tools.verify_drive (console script nvw-verify); this path
serves the documented `python tools/verify_drive.py` invocation without
requiring an installed package."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nv_wavenet_tpu.tools.verify_drive import main

if __name__ == "__main__":
    main()
