from dflash_tpu.bench.metrics import summarize_mode, summarize_profile, tau_histogram

__all__ = ["summarize_mode", "summarize_profile", "tau_histogram"]
