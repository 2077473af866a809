#!/usr/bin/env python3
"""Entry point with the reference's surface: python3 main.py --config config.yaml
(/root/reference/main.py)."""
from cama_tpu.cli import main_entry

if __name__ == "__main__":
    main_entry()
