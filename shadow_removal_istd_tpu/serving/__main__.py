"""``python -m shadow_removal_istd_tpu.serving`` -> serving daemon."""

from shadow_removal_istd_tpu.serving.server import main

raise SystemExit(main())
