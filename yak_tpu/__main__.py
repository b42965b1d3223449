import sys

from yak_tpu.cli import main

sys.exit(main())
