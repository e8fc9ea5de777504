from mmd_tpu.data import labels, schema
