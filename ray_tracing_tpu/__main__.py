"""`python -m ray_tracing_tpu --scene ... ` — the reference binary's CLI."""

import sys

from ray_tracing_tpu.apps.cli import main

sys.exit(main())
