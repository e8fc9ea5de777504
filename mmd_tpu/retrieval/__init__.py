from mmd_tpu.retrieval.image import ImageCorpus
from mmd_tpu.retrieval.text import TextCorpus, SemanticSearch
