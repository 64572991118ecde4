"""Pure-JAX math core: RBM, NADE, and RNN primitives (SURVEY C5, C6 and the
RNN cell underlying C7/C8). Everything here is a pure function over explicit
parameter pytrees — no framework classes, no hidden state."""

from multinn_tpu.nn import rbm, nade, rnn  # noqa: F401
