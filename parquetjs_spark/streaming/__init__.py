from .decode_stream import decode_stream  # noqa: F401
from .dedup_stream import dedup_stream  # noqa: F401
from .encode_stream import encode_stream  # noqa: F401
