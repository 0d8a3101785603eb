"""`python -m gps_sdr_tpu` — CLI launcher (see gps_sdr_tpu/cli.py)."""

import sys

from gps_sdr_tpu.cli import main

sys.exit(main())
