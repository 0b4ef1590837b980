"""Optimizers over scene parameters.

Equivalent of the reference's ad/optimizers.py (Optimizer:6, SGD:112,
Adam:204): dict-of-arrays state with per-parameter learning rates and
optional masked updates (only update where a gradient was received).
Built on plain jnp so steps stay jittable; optax can be swapped in by
the user since params are a flat dict pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Optimizer:
    """Base: holds params + per-parameter learning rates
    (ad/optimizers.py:6)."""

    def __init__(self, lr, params: dict):
        self.lr_default = lr
        self.lr = {}
        self.params = dict(params)
        self.state = {}
        for k, v in self.params.items():
            self._reset(k)

    def set_learning_rate(self, lr: dict | float, key=None):
        if isinstance(lr, dict):
            self.lr.update(lr)
        elif key is not None:
            self.lr[key] = lr
        else:
            self.lr_default = lr

    def learning_rate(self, k):
        return self.lr.get(k, self.lr_default)

    def keys(self):
        return self.params.keys()

    def __getitem__(self, k):
        return self.params[k]

    def __setitem__(self, k, v):
        self.params[k] = jnp.asarray(v)
        self._reset(k)

    def _reset(self, k):
        pass


class SGD(Optimizer):
    """SGD with optional momentum (ad/optimizers.py:112)."""

    def __init__(self, lr, params: dict, momentum: float = 0.0):
        self.momentum = momentum
        super().__init__(lr, params)

    def _reset(self, k):
        if self.momentum > 0.0:
            self.state[k] = jnp.zeros_like(self.params[k])

    def step(self, grads: dict):
        for k, g in grads.items():
            if k not in self.params:
                continue
            lr = self.learning_rate(k)
            if self.momentum > 0.0:
                v = self.momentum * self.state[k] + g
                self.state[k] = v
                self.params[k] = self.params[k] - lr * v
            else:
                self.params[k] = self.params[k] - lr * g
        return self.params


class Adam(Optimizer):
    """Adam with optional masked updates and uniform variant
    (ad/optimizers.py:204)."""

    def __init__(self, lr, params: dict, beta_1: float = 0.9,
                 beta_2: float = 0.999, epsilon: float = 1e-8,
                 mask_updates: bool = False, uniform: bool = False):
        self.beta_1 = beta_1
        self.beta_2 = beta_2
        self.epsilon = epsilon
        self.mask_updates = mask_updates
        self.uniform = uniform
        self.t = {}
        super().__init__(lr, params)

    def _reset(self, k):
        p = self.params[k]
        self.state[k] = (jnp.zeros_like(p), jnp.zeros_like(p))
        self.t[k] = 0

    def step(self, grads: dict):
        for k, g in grads.items():
            if k not in self.params:
                continue
            lr = self.learning_rate(k)
            m_t, v_t = self.state[k]
            self.t[k] += 1
            t = self.t[k]
            nz = g != 0.0 if self.mask_updates else None
            m_new = self.beta_1 * m_t + (1 - self.beta_1) * g
            v_new = self.beta_2 * v_t + (1 - self.beta_2) * g * g
            if self.mask_updates:
                m_new = jnp.where(nz, m_new, m_t)
                v_new = jnp.where(nz, v_new, v_t)
            self.state[k] = (m_new, v_new)
            lr_t = lr * jnp.sqrt(1 - self.beta_2 ** t) / (1 - self.beta_1 ** t)
            if self.uniform:
                denom = jnp.sqrt(jnp.max(v_new)) + self.epsilon
            else:
                denom = jnp.sqrt(v_new) + self.epsilon
            upd = lr_t * m_new / denom
            if self.mask_updates:
                upd = jnp.where(nz, upd, 0.0)
            self.params[k] = self.params[k] - upd
        return self.params
