"""`python -m bsalign_tpu <align|edit|poa|cat> ...` — same single-command
ergonomics as the reference binary (main.c:649-659)."""
import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
