"""mmd_tpu — TPU-native multimodal misinformation detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
sakdag/multimodal-misinformation-detection (reference mounted read-only at
/root/reference): an evidence-backed multimodal (text+image) misinformation
detector over the Factify-2 dataset with five pipeline stages
(download -> preprocess -> caption-enrich -> evidence retrieval -> classify).

Layering (bottom to top, unlike the reference's flat src/):

    core      mesh/sharding init, config, PRNG discipline, checkpointing, metrics
    ops       pallas kernels + XLA ops: fused attention, top-k retrieval, image ops
    models    fusion model, text/image encoders, captioner
    data      schema, label ontology, CSV preprocess, array stores, loaders
    parallel  sharding rules over the device mesh (dp/tp axes)
    retrieval HBM-resident corpus search (text2text, im2im)
    training  train step/loop, losses, metrics
    inference predictor (evaluate.py parity)
    pipelines offline drivers: embed, caption, eval_*
"""

__version__ = "0.1.0"
