from periodicity_spark.pipeline import dedup, multimodal, simsearch, text

__all__ = ["dedup", "simsearch", "text", "multimodal"]
