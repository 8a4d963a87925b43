#!/usr/bin/env python
"""Detection CLI — surface parity with the reference detect.py argparse."""
import sys
from realtimeobjectdetection_tpu.cli import detect_cli

if __name__ == "__main__":
    detect_cli(sys.argv[1:])
