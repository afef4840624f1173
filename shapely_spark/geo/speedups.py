"""reference: shapely/speedups.py — legacy API kept for import parity.

The reference's C speedups became mandatory in Shapely 2 and this module
degraded to deprecated no-ops; here the vectorized NumPy kernels are
always on, so `available`/`enabled` are constants and enable/disable do
nothing."""

available = True
enabled = True


def enable() -> None:
    """No-op (reference: shapely/speedups.py:24)."""


def disable() -> None:
    """No-op (reference: shapely/speedups.py:33)."""
