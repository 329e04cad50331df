#!/usr/bin/env python
"""Root evaluation entry point (same role as the reference's test.py)."""
from mocopci_tpu.cli.test import main

if __name__ == "__main__":
    main()
