"""Legacy ``geos`` module shim — parity with the reference's
shapely/geos.py (deprecated there since 2.0: every attribute is also
available from the top-level package namespace, and importing the module
warns). Downstream libraries use these for capability gating
(``if geos_version >= (3, 12, 0): ...``).

This engine has no libgeos underneath; it reports the GEOS version whose
semantics its kernels pin (the version the reference test fixtures this
repo gates against were written for), with an explicit marker in the
version strings.
"""

import warnings

from . import (
    geos_capi_version, geos_capi_version_string, geos_version,
    geos_version_string,
)

warnings.warn(
    "The 'geos' module is deprecated, and will be removed in a future "
    "version. All attributes of 'geos' are available directly from the "
    "top-level namespace (since shapely 2.0.0).",
    DeprecationWarning,
    stacklevel=2,
)

__all__ = [
    "geos_version", "geos_version_string",
    "geos_capi_version", "geos_capi_version_string",
]
