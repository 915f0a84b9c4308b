from .hashing import md5_hex, portable_min_hash, word_shingles  # noqa: F401
from .textfn import haversine_m, tokenize  # noqa: F401
