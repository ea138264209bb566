"""Adan (Adaptive Nesterov momentum) as an optax GradientTransformation.

Update math matches the reference optimizer (/root/reference/optimizer.py,
`_single_tensor_adan` at optimizer.py:238-293; defaults at :65-74):
betas (0.98, 0.92, 0.99), eps 1e-8, decoupled/proximal weight decay, optional
global-norm pre-clip, and the first-step convention that the previous
gradient equals the current one (zero first difference).

TPU-native design: a single jitted pytree update — XLA fuses the whole
five-EMA chain into one pass over the parameters, which is what the
reference's optional fused-CUDA path (`fused_adan`) hand-writes. The
learning rate is read from the update's ``lr`` kwarg (injected per step by
the trainer after evaluating the string schedule) or fixed at construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    step: jnp.ndarray          # int32 scalar
    exp_avg: optax.Updates     # m_t  (EMA of grads)
    exp_avg_diff: optax.Updates  # d_t (EMA of grad differences)
    exp_avg_sq: optax.Updates  # n_t  (EMA of squared Nesterov grads)
    prev_grad: optax.Updates


def adan(learning_rate: float = 1e-3,
         b1: float = 0.98, b2: float = 0.92, b3: float = 0.99,
         eps: float = 1e-8, weight_decay: float = 0.0,
         max_grad_norm: float = 0.0,
         no_prox: bool = False) -> optax.GradientTransformation:

    def init_fn(params):
        # four independent zero trees: sharing one would alias buffers and
        # break argument donation in jitted train steps
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(step=jnp.zeros([], jnp.int32),
                         exp_avg=zeros(), exp_avg_diff=zeros(),
                         exp_avg_sq=zeros(), prev_grad=zeros())

    def update_fn(grads, state: AdanState, params=None, *, lr=None):
        if params is None:
            raise ValueError("adan requires params")
        step = state.step + 1
        stepf = step.astype(jnp.float32)
        bc1 = 1.0 - b1 ** stepf
        bc2 = 1.0 - b2 ** stepf
        bc3_sqrt = jnp.sqrt(1.0 - b3 ** stepf)
        cur_lr = jnp.asarray(learning_rate if lr is None else lr, jnp.float32)

        if max_grad_norm > 0.0:
            gnorm = optax.global_norm(grads)
            clip = jnp.minimum(max_grad_norm / (gnorm + eps), 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * clip, grads)

        is_first = step == 1

        def leaf(p, g, m, d, n, pg):
            g_prev = jnp.where(is_first, g, pg)
            diff = g - g_prev
            m_t = b1 * m + (1.0 - b1) * g
            d_t = b2 * d + (1.0 - b2) * diff
            u = g + b2 * diff
            n_t = b3 * n + (1.0 - b3) * u * u
            denom = jnp.sqrt(n_t) / bc3_sqrt + eps
            delta = -(cur_lr / bc1) * m_t / denom \
                    - (cur_lr * b2 / bc2) * d_t / denom
            if weight_decay > 0.0:
                if no_prox:
                    delta = delta - cur_lr * weight_decay * p
                else:
                    # proximal form: p_new = (p + delta)/(1 + lr*wd)
                    delta = (p + delta) / (1.0 + cur_lr * weight_decay) - p
            return delta, m_t, d_t, n_t, g

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(grads)
        flat_m = treedef.flatten_up_to(state.exp_avg)
        flat_d = treedef.flatten_up_to(state.exp_avg_diff)
        flat_n = treedef.flatten_up_to(state.exp_avg_sq)
        flat_pg = treedef.flatten_up_to(state.prev_grad)
        out = [leaf(*xs) for xs in zip(flat_p, flat_g, flat_m, flat_d, flat_n, flat_pg)]
        unflatten = treedef.unflatten
        updates = unflatten([o[0] for o in out])
        new_state = AdanState(
            step=step,
            exp_avg=unflatten([o[1] for o in out]),
            exp_avg_diff=unflatten([o[2] for o in out]),
            exp_avg_sq=unflatten([o[3] for o in out]),
            prev_grad=unflatten([o[4] for o in out]),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
