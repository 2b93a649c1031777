from baker_spark.functions.hashing import md5_long, duck_md5_long  # noqa: F401
from baker_spark.functions.numeric import dec, cents, micros  # noqa: F401
