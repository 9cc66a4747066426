"""Analytic FLOP counting by walking a jaxpr.

XLA's ``compiled.cost_analysis()`` under-reports convolution FLOPs on
the TPU backend (fused custom calls report ~0), so MFU numbers built on
it are meaningless. This counts matmul/conv FLOPs from the traced
jaxpr instead: 2*M*N*K for ``dot_general``,
2 * out_elements * (KH*KW*Cin/groups) for ``conv_general_dilated``,
recursing into scan/while/cond/pjit/custom_* sub-jaxprs (scan bodies
multiply by trip count).

Elementwise work is ignored — on TPU the MXU terms dominate by orders
of magnitude, and roofline/MFU accounting conventionally counts only
them.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    dims = eqn.params["dimension_numbers"]
    (lhs_c, rhs_c), (lhs_b, _) = dims
    m = math.prod(a.shape[i] for i in range(len(a.shape))
                  if i not in tuple(lhs_c) + tuple(lhs_b))
    n = math.prod(b.shape[i] for i in range(len(b.shape))
                  if i not in tuple(rhs_c) + tuple(dims[1][1]))
    k = math.prod(a.shape[i] for i in lhs_c)
    batch = math.prod(a.shape[i] for i in lhs_b)
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    # kernel: spatial dims + input-feature dim per dn.rhs_spec
    rhs_spec = dn.rhs_spec  # (out_feat, in_feat, *spatial)
    k_elems = math.prod(rhs.shape[i] for i in rhs_spec[1:])  # Cin * prod(K)
    out_elems = math.prod(out.shape)
    # input dilation (transposed convs / conv input-grads) interleaves
    # zeros into the lhs: only ~1/prod(lhs_dilation) of the taps touch
    # real data, and TPU XLA exploits that (measured: conv_transpose
    # matches an explicit phase decomposition) — count useful FLOPs.
    lhs_dilation = eqn.params.get("lhs_dilation") or ()
    k_elems /= max(math.prod(lhs_dilation), 1)
    return 2.0 * out_elems * k_elems / max(groups, 1)


def count_jaxpr_flops(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # trip count unknown statically; count one iteration
            total += count_jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(count_jaxpr_flops(b.jaxpr)
                         for b in eqn.params["branches"])
        else:
            for key in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += count_jaxpr_flops(
                        sub.jaxpr if hasattr(sub, "jaxpr") else sub)
    return total


def count_flops(fn, *args, **kwargs) -> float:
    """MXU FLOPs of one call of ``fn(*args, **kwargs)``."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return count_jaxpr_flops(closed.jaxpr)


def count_flops_abstract(fn, *args, **kwargs) -> float:
    """Like count_flops but accepts ShapeDtypeStruct args."""
    closed = jax.make_jaxpr(
        fn, static_argnums=())(*jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype)
            if hasattr(a, "dtype") else a, args), **kwargs)
    return count_jaxpr_flops(closed.jaxpr)
