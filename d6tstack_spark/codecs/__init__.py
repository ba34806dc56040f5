"""Pure numpy/pyarrow codec kernels + block framing. No Spark imports here."""

from d6tstack_spark.codecs.kernels import (  # noqa: F401
    CODECS,
    decode_values,
    encode_values,
)
from d6tstack_spark.codecs.blocks import (  # noqa: F401
    Block,
    decode_block,
    encode_block,
)
from d6tstack_spark.codecs.selector import (  # noqa: F401
    choose_codec,
    sniff_stats,
)
