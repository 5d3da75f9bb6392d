"""Allow ``python -m tiatoolbox_tpu.cli <command>``."""

from tiatoolbox_tpu.cli import main

if __name__ == "__main__":
    main()
