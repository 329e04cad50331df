#!/usr/bin/env python
"""Root training entry point (same role as the reference's train.py)."""
from mocopci_tpu.cli.train import main

if __name__ == "__main__":
    main()
