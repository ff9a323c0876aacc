from sotohp_ray.functions.tokenizer import CodeTokenizer
from sotohp_ray.functions import codec, hashing

__all__ = ["CodeTokenizer", "codec", "hashing"]
