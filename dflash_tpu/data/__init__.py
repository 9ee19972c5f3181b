from dflash_tpu.data.datasets import load_and_process_dataset, DATASET_REGISTRY

__all__ = ["load_and_process_dataset", "DATASET_REGISTRY"]
