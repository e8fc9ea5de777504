from mmd_tpu.inference.predictor import MisinformationPredictor
from mmd_tpu.inference.rules import (
    get_final_classification, determine_final_classification,
)
