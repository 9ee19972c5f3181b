from dflash_tpu.quant.quantize import quantize_draft_params, quantize_target_params

__all__ = ["quantize_target_params", "quantize_draft_params"]
