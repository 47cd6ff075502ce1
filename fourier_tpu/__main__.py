"""`python -m fourier_tpu` — the CLI entry (reference src/main.rs)."""

import sys

from .runtime.cli import main

sys.exit(main())
