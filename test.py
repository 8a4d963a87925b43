#!/usr/bin/env python
"""Validation / ROC-sweep CLI (the reference test.py's __main__ role).

NOTE: pytest unit tests live under tests/ — this file is model
validation, mirroring the reference's naming.
"""
import sys
from realtimeobjectdetection_tpu.cli import validate_cli

if __name__ == "__main__":
    validate_cli(sys.argv[1:])
