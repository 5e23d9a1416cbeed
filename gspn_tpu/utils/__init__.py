from gspn_tpu.utils.timing import sync, time_fn

__all__ = ["sync", "time_fn"]
