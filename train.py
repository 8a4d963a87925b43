#!/usr/bin/env python
"""Training CLI — surface parity with the reference train.py argparse."""
import sys
from realtimeobjectdetection_tpu.cli import train_cli

if __name__ == "__main__":
    train_cli(sys.argv[1:])
