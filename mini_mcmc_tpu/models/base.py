"""Target / proposal / conditional abstractions as pure functions.

TPU-native redesign of the reference's trait surface
(``/root/reference/src/distributions.rs:65-134,485-487``):

- ``Target<T,F>::unnorm_logp(&[T]) -> F``          -> ``Target.logp`` (pure fn)
- ``GradientTarget::unnorm_logp_and_grad``          -> ``jax.value_and_grad``
- ``BatchedGradientTarget::unnorm_logp_batch``      -> ``jax.vmap`` (or an
  analytic ``logp_batch`` override for fused batched evaluation)
- ``Proposal<T,F>`` (sample/logp/set_seed)          -> ``Proposal`` (pure fns,
  explicit PRNG keys; seeding is the caller's key, not mutable state)
- ``Conditional<S>::sample(index, given)``          -> ``Conditional.sample``
  with an explicit key: ``(key, index, state) -> value``

The batched/unbatched split of the reference collapses: every sampler in this
framework operates on ``[n_chains, D]`` batches, with ``vmap`` deriving the
batched form from a per-state ``logp`` unless an analytic batched version is
supplied (which XLA can fuse better for hot paths).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Target:
    """An unnormalized target density.

    Attributes:
        logp: ``[D] -> scalar`` unnormalized log density for one state.
        logp_batch: optional analytic ``[C, D] -> [C]`` override. Defaults to
            ``vmap(logp)``.
        grad: optional analytic gradient ``[D] -> [D]``. Defaults to
            ``jax.grad(logp)``.
        logp_normalized: optional normalized log density (diagnostics), the
            analog of the reference's ``Normalized`` trait.
    """

    logp: Callable
    logp_batch: Optional[Callable] = None
    grad: Optional[Callable] = None
    logp_normalized: Optional[Callable] = None
    #: optional chains-on-lanes forms for Pallas kernels: ``[D, C] -> [C]``
    #: log density and ``[D, C] -> [D, C]`` gradient (jnp ops only).
    logp_dc: Optional[Callable] = None
    grad_dc: Optional[Callable] = None

    def batch_logp(self, positions: jax.Array) -> jax.Array:
        """Log density for a ``[C, D]`` batch of positions -> ``[C]``."""
        if self.logp_batch is not None:
            return self.logp_batch(positions)
        return jax.vmap(self.logp)(positions)

    def batch_logp_and_grad(self, positions: jax.Array):
        """Value and gradient for a ``[C, D]`` batch -> (``[C]``, ``[C, D]``).

        Replaces the reference's detach/require_grad/backward dance
        (``/root/reference/src/distributions.rs:81-87``) with reverse-mode AD
        traced once under ``jit``.
        """
        if self.grad is not None:
            if self.logp_batch is not None:
                vals = self.logp_batch(positions)
            else:
                vals = jax.vmap(self.logp)(positions)
            grads = jax.vmap(self.grad)(positions)
            return vals, grads
        if self.logp_batch is not None:
            # Differentiate the fused batched form: sum trick gives per-row
            # gradients because rows are independent.
            vals, vjp = jax.vjp(self.logp_batch, positions)
            (grads,) = vjp(jnp.ones_like(vals))
            return vals, grads
        return jax.vmap(jax.value_and_grad(self.logp))(positions)

    def logp_and_grad(self, position: jax.Array):
        """Value and gradient for a single ``[D]`` state."""
        if self.grad is not None:
            return self.logp(position), self.grad(position)
        return jax.value_and_grad(self.logp)(position)

    def dc_forms(self):
        """``(logp_dc, grad_dc)`` for the fused Pallas kernels.

        When only ``logp_dc`` is supplied, the gradient is derived with
        :func:`derive_grad_dc` — writing the density in chains-on-lanes
        form is enough to unlock every fused kernel tier; a hand-written
        ``grad_dc`` remains an optional override (it can be cheaper when
        value and gradient share subexpressions).
        """
        if self.logp_dc is None or self.grad_dc is not None:
            return self.logp_dc, self.grad_dc
        return self.logp_dc, derive_grad_dc(self.logp_dc)


def derive_grad_dc(logp_dc: Callable) -> Callable:
    """The ``[D, ...] -> [D, ...]`` gradient of a chains-on-lanes log
    density, derived by reverse-mode AD.

    Lanes are independent chains, so the VJP of ``logp_dc`` with a ones
    cotangent IS the per-lane gradient (the sum trick). Because a valid
    ``logp_dc`` uses only elementwise/broadcast jnp ops, its transpose is
    also elementwise — the derived gradient traces into Pallas kernel
    bodies exactly like a hand-written one.
    """

    def grad_dc(p):
        out, vjp = jax.vjp(logp_dc, p)
        (g,) = vjp(jnp.ones_like(out))
        return g

    return grad_dc


@dataclasses.dataclass(frozen=True)
class Proposal:
    """A proposal kernel q(x' | x) with explicit PRNG keys.

    Attributes:
        sample: ``(key, current [D]) -> proposed [D]``.
        logp: ``(from [D], to [D]) -> scalar`` log q(to | from).
        sample_batch: optional ``(key, current [C, D]) -> [C, D]`` drawing
            the whole batch from ONE key (saves the per-chain key split —
            a 2-3x RNG-cost cut at large chain counts).
        propose_dc: optional chains-on-lanes form for the fused Pallas MH
            kernel: ``(rng, pos [D, ...]) -> proposed [D, ...]`` using the
            in-kernel hardware PRNG namespace ``ops/pallas/rng`` (jnp ops
            only).
        symmetric: whether ``logp(a, b) == logp(b, a)`` for all a, b — the
            fused kernel requires this (it skips the q terms of the accept
            ratio, which cancel).
        scaled: optional ``(factor) -> Proposal`` returning this proposal
            with its length scale multiplied by ``factor`` (``factor`` may
            be a traced scalar). Enables adaptive proposal-scale tuning
            (``MetropolisHastings.tuned`` — beyond-reference; the
            reference's proposal scale is fixed forever,
            /root/reference/src/distributions.rs:344-396).
    """

    sample: Callable
    logp: Callable
    sample_batch: Optional[Callable] = None
    propose_dc: Optional[Callable] = None
    symmetric: bool = False
    scaled: Optional[Callable] = None


@dataclasses.dataclass(frozen=True)
class Conditional:
    """Full-conditional sampler for Gibbs (reference ``Conditional<S>``).

    Attributes:
        sample: ``(key, index, state [D]) -> scalar`` draws coordinate
            ``index`` from its full conditional given the complete state.
            Must be JAX-traceable (``index`` is a traced int under the
            coordinate sweep loop).
        sample_batch: optional ``(key, index, states [C, D]) -> [C]``
            drawing coordinate ``index`` for ALL chains from one key —
            skips the per-chain key splitting and runs the conditional as
            batched tensor ops.
        sample_dc: optional chains-on-lanes form for the fused Pallas
            Gibbs kernel: ``(rng, index, state [D, ...]) -> [...]`` drawing
            coordinate ``index`` (a STATIC Python int — the in-kernel sweep
            is unrolled) using the in-kernel hardware PRNG namespace
            ``ops/pallas/rng`` (jnp ops only).
    """

    sample: Callable
    sample_batch: Optional[Callable] = None
    sample_dc: Optional[Callable] = None
