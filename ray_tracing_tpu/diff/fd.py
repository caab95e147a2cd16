"""Finite-difference gradient oracle.

The reference has no gradients at all — differentiability is a new
capability of this framework (BASELINE.md target "grad allclose vs FD").
This module provides a generic central-difference oracle over pytrees used
by the test suite to validate `jax.grad` through the whole renderer.

Scope note (standard differentiable-rendering caveat, cf. PAPERS.md
Dr.Jit / RayTracer.jl): the renderer's discrete decisions (which object a
ray hits, specular-vs-diffuse branch) are detached, so analytic gradients
carry *interior* terms only — silhouette (visibility-boundary) terms are
not included. FD comparisons therefore hold tightly for material/shading
parameters everywhere, and for geometry/camera parameters when the loss is
supported away from visibility boundaries. Inverse rendering (diff/inverse)
works fine in this regime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def finite_difference_grad(f, params, eps: float = 1e-3):
    """Central-difference gradient of scalar f(params) w.r.t. every float
    leaf of the pytree `params`. Returns a pytree of the same structure.

    O(2 * num_scalars) evaluations — use tiny parameter trees only. f is
    jitted here (one compile, then cheap evals).
    """
    f = jax.jit(f)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    grads = []
    for li, leaf in enumerate(leaves):
        leaf = np.asarray(leaf, np.float64)
        g = np.zeros_like(leaf)
        flat = leaf.reshape(-1)
        gflat = g.reshape(-1)
        for i in range(flat.size):
            def eval_at(delta):
                pert = flat.copy()
                pert[i] += delta
                new_leaf = jnp.asarray(pert.reshape(leaf.shape), jnp.float32)
                new_leaves = list(leaves)
                new_leaves[li] = new_leaf
                return float(f(jax.tree_util.tree_unflatten(treedef, new_leaves)))

            gflat[i] = (eval_at(eps) - eval_at(-eps)) / (2 * eps)
        grads.append(jnp.asarray(g, jnp.float32))
    return jax.tree_util.tree_unflatten(treedef, grads)
