from mmd_tpu.ops.attention import multi_head_attention, attention_reference
