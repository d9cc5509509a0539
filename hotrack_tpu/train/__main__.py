"""CLI: python -m hotrack_tpu.train --config <name>.yml [--key/subkey value]
(README.md:100-105 surface)."""

from .cli import train_main

if __name__ == "__main__":
    train_main()
