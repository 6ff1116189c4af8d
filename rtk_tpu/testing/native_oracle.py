"""Test-suite alias for the native SAH binding (rtk_tpu/utils/native_sah.py).

The binding started life as the test oracle; it is now also the production
host-side SAH builder (builder/sah.py), so the implementation lives in
utils and this module re-exports it for the test pyramid."""
from rtk_tpu.utils.native_sah import NativeOracle

__all__ = ["NativeOracle"]
