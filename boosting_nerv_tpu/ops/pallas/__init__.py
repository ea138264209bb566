from .fused_sft import resblock_sft_chw
