"""Helper to import modules from the read-only reference implementation as
test oracles (torch CPU). Used ONLY in tests for behavioral parity checks —
the framework itself never imports from the reference.
"""

import importlib
import sys

REFERENCE_ROOT = "/root/reference"


def import_reference_module(name: str):
    """Import e.g. 'models.lib.quantizer' from the reference tree."""
    added = False
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
        added = True
    try:
        return importlib.import_module(name)
    finally:
        if added:
            sys.path.remove(REFERENCE_ROOT)
