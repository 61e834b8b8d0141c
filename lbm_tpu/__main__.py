import sys

from lbm_tpu.cli import main

sys.exit(main())
