from semivl_tpu.text.embeddings import (
    aggregate_concept_predictions,
    get_class_to_concept_idxs,
    load_text_embedding,
    text_embedding_path,
)

__all__ = [
    "aggregate_concept_predictions",
    "get_class_to_concept_idxs",
    "load_text_embedding",
    "text_embedding_path",
]
