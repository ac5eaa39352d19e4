from volpick_tpu.ops.pallas.conditioning import condition_windows_pallas

__all__ = ["condition_windows_pallas"]
