#!/usr/bin/env python
"""Public entry point: ``python main.py detect|train`` driven by params.json.

Surface parity with the reference main.py; all logic lives in
realtimeobjectdetection_tpu.cli.
"""

import sys

from realtimeobjectdetection_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
