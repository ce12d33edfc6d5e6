"""Import helper for the reference implementation (oracle for parity tests).

The reference's package __init__ imports the external `dac` package, which is
not installed; stub it (only DAC instantiation needs it, which these tests
never do).
"""

import sys
import types


def import_reference_parler_tts():
    if "dac" not in sys.modules:
        dac = types.ModuleType("dac")
        dac_model = types.ModuleType("dac.model")

        class _StubDAC:
            def __init__(self, *a, **k):
                raise RuntimeError("dac stub: not available in tests")

        dac_model.DAC = _StubDAC
        dac.model = dac_model
        sys.modules["dac"] = dac
        sys.modules["dac.model"] = dac_model
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import parler_tts  # noqa: F401

    return parler_tts
