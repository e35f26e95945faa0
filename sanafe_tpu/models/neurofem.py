"""NeuroFEM combined dendrite+soma model (Python plugin).

Port of the reference's second example plugin
(``plugins/neurofem.cpp:23-320``): a Loihi-2-style PID/FEM placeholder with
two double-buffered dendritic compartments (edges route via a
``compartment`` attribute, 0 or 1). Compartment sums arrive one step after
the presynaptic spike, matching the reference's next_* accumulators.

The reference adds ``sigma_v * N(0,1)`` membrane noise drawn from an
``std::mt19937`` seeded by ``std::random_device``
(plugins/neurofem.cpp:26-28) — nondeterministic across runs even there.
This port keeps the noise term but replaces the seed policy with a
counter-based stream: ``N(0,1)`` samples from a threefry key folded with
the timestep, so runs are bit-reproducible and resumable (sample t is
the same whether reached in one sim() call or several). Set
``SANAFE_TPU_NEUROFEM_SEED`` to change the stream (default 42); the
distribution, not the sequence, matches the reference.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from . import register_soma_model

NEUROFEM_ATTRIBUTES = {
    "lambda_v": "(float) Membrane potential leak rate.",
    "lambda_d": "(float) Dendritic current leak rate.",
    "sigma_v": "(float) Gaussian membrane-noise amplitude (seeded "
    "stream; see module docstring).",
    "ki": "(float) PID integral gain.",
    "kp": "(float) PID proportional gain.",
    "bias": "(float) Constant input error bias.",
    "threshold": "(float) Firing threshold.",
    "reset": "(float) Reset potential.",
    "dt": "(float) Integration timestep.",
    "compartment": "(int, per edge) Destination compartment, 0 or 1.",
}


def neurofem_update(params, state, valid, current, t, comp):
    """process_fem (plugins/neurofem.cpp:275-318) with compartment inputs
    comp[:, 0] -> u1 and comp[:, 1] -> u2."""
    dt = params["dt"]
    lambda_d = params["lambda_d"]
    lambda_v = params["lambda_v"]

    u1 = state["u1"]
    u2 = state["u2"]
    v = state["potential"]
    u_integrated = state["u_integrated"]

    comp0 = comp[:, 0]
    comp1 = comp[:, 1]

    u1 = u1 - lambda_d * dt * u1 + comp0
    u2 = u2 - lambda_d * dt * u2 + lambda_d * comp1

    u_error = u1 + params["bias"]
    u_integrated = u_integrated + dt * u_error

    v = v - lambda_v * dt * v
    # Seeded, replayable stand-in for the reference's random_device-seeded
    # mt19937 normal draws (plugins/neurofem.cpp:296-303). Params arrive as
    # traced jit arguments, so gate the per-step RNG behind a runtime cond:
    # with sigma_v all zero (the default) the normal draw never executes
    # instead of being drawn and multiplied by zero every step.
    sigma_v = params["sigma_v"]

    def _draw_noise():
        seed = int(os.environ.get("SANAFE_TPU_NEUROFEM_SEED", "42"))
        key = jax.random.fold_in(
            jax.random.PRNGKey(seed), jnp.asarray(t, jnp.uint32)
        )
        return sigma_v * jax.random.normal(key, v.shape, dtype=v.dtype)

    noise_term = jax.lax.cond(
        jnp.any(sigma_v != 0.0), _draw_noise, lambda: jnp.zeros_like(v)
    )
    v = (
        v
        + dt * params["kp"] * u_error
        + dt * params["ki"] * u_integrated
        + dt * u2
        + noise_term
        - comp1
    )

    fired = v > params["threshold"]
    v = jnp.where(fired, params["reset"], v)
    updated = jnp.ones_like(fired)
    new_state = {
        "potential": v,
        "u1": u1,
        "u2": u2,
        "u_integrated": u_integrated,
    }
    return new_state, fired, updated, v


register_soma_model(
    "neurofem",
    neurofem_update,
    params={
        "lambda_v": 0.0,
        "lambda_d": 0.0,
        "sigma_v": 0.0,
        "ki": 0.0,
        "kp": 0.0,
        "bias": 0.0,
        "threshold": 0.0,
        "reset": 0.0,
        "dt": 1.0e-3,
    },
    state={"potential": 0.0, "u1": 0.0, "u2": 0.0, "u_integrated": 0.0},
    attributes=NEUROFEM_ATTRIBUTES,
    dendrite_compartments=2,
)
