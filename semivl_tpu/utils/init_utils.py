"""Model initialisation helper.

``flax`` ``Module.init`` evaluates eagerly — on this runtime every op
round-trips the device tunnel (~ms each), making full-model init take
minutes. Tracing the whole init under one jit collapses it to a single
compile + execute.
"""

import jax


def jit_init(module, rngs, *args, method=None):
    def _init(rngs, *a):
        if method is not None:
            return module.init(rngs, *a, method=method)
        return module.init(rngs, *a)

    return jax.jit(_init)(rngs, *args)
