from dflash_tpu.sched.ewma import EWMAScheduler, SchedulerConfig

__all__ = ["EWMAScheduler", "SchedulerConfig"]
