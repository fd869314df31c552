"""Helper to import the reference package as a numeric oracle.

The reference at /root/reference is used read-only to produce expected
values in tests marked ``oracle``. Tests degrade to skip if it is absent.
"""

import sys
import types

REF_PATH = "/root/reference"


def _stub_traits():
    """The reference's top-level __init__ needs `traits` (Qt GUI config) and
    `chardet` (zmx encoding detection), neither installed here. Stub just
    enough so the numeric tracer subpackage imports."""
    if "traits.etsconfig.api" not in sys.modules:
        traits = types.ModuleType("traits")
        etsconfig = types.ModuleType("traits.etsconfig")
        api = types.ModuleType("traits.etsconfig.api")
        api.ETSConfig = types.SimpleNamespace(toolkit=None)
        traits.etsconfig = etsconfig
        etsconfig.api = api
        sys.modules["traits"] = traits
        sys.modules["traits.etsconfig"] = etsconfig
        sys.modules["traits.etsconfig.api"] = api
    if "chardet" not in sys.modules:
        chardet = types.ModuleType("chardet")

        def _detect(b, **kw):
            # BOM-based detection is enough for the ZEMAX fixtures
            if b.startswith(b"\xff\xfe\x00\x00"):
                return {"encoding": "utf-32-le"}
            if b.startswith(b"\xff\xfe"):
                return {"encoding": "utf-16-le"}
            if b.startswith(b"\xfe\xff"):
                return {"encoding": "utf-16-be"}
            if b.startswith(b"\xef\xbb\xbf"):
                return {"encoding": "utf-8-sig"}
            try:
                b.decode("utf-8")
                return {"encoding": "utf-8"}
            except UnicodeDecodeError:
                return {"encoding": "latin-1"}

        chardet.detect = _detect
        chardet.EncodingEra = types.SimpleNamespace(MODERN_WEB=None)
        sys.modules["chardet"] = chardet


def get_reference():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _stub_traits()
    try:
        import optrace  # noqa: F401
        return optrace
    except Exception:
        return None
