"""Driver benchmark entry point — delegates to the packaged implementation
(romhighcontrast_tpu.benchmarks) so the CLI works on installed distributions
too.  Prints exactly one JSON line."""

import sys

from romhighcontrast_tpu.benchmarks import main

if __name__ == "__main__":
    sys.exit(main())
