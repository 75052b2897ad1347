"""Import shim for running the PyTorch reference at /root/reference as a
measurement/oracle target outside pytest.

Delegates to tests/conftest.py's `_install_reference_shim` so there is one
shim to maintain (it stubs the third-party modules absent here, aliases the
reference packages, and polyfills numpy>=2 removals). The reference is only
imported and *called*; never copied.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install():
    for p in (REPO, os.path.join(REPO, "tests")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import conftest
    conftest._install_reference_shim()
