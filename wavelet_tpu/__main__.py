"""``python -m wavelet_tpu`` == the reference-compatible CLI."""

import sys

from wavelet_tpu.cli import main

sys.exit(main())
