"""Pallas TPU kernels: the hand-tuned hot ops of the engine.

Every kernel has an XLA reference implementation in ``dflash_tpu.ops`` and a
numerics test pinning the two together (SURVEY §7 step 4).
"""
