"""Back-compat shim: the kernel self-test now ships in the package
(``rgnir-tpu selftest``). See rgnir_tpu.testing.selftest."""

import sys

from rgnir_tpu.testing.selftest import main

if __name__ == "__main__":
    sys.exit(main())
