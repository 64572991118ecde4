"""Model layer (SURVEY L2/L3): encoder/decoder modules (C7–C10) and the
MultINN multi-track composition (C11–C12)."""

from multinn_tpu.models import base, rnn_rbm, rnn_nade, encoders, multinn  # noqa: F401
from multinn_tpu.models.base import DecoderConfig, get_decoder  # noqa: F401
