"""Symbolic PDE residual layer — the ``dif`` mini-DSL, compiled to XLA.

TPU-native equivalent of the reference's ``src/pde.py::PDELayer``. The
reference declares variables as comma-separated strings, adds equations
as sympy-parseable strings using the derivative operator ``dif(f, v)``
(nested for higher order: ``dif(dif(u, x), x)``; optional ``lhs = rhs``
form means residual ``lhs - rhs``), binds a forward method mapping
query coordinates to output fields, and at eval time walks the sympy
tree substituting ``dif`` with ``torch.autograd.grad(...,
create_graph=True)`` — building second-order reverse-mode graphs at
runtime.

The TPU-first redesign compiles instead of interpreting:

1. at ``add_equation`` time, ``dif`` parses directly to
   ``sympy.Derivative``; ``.doit()`` pushes derivatives down through
   products/compositions (chain rule done *symbolically*, once), leaving
   atomic derivatives of the unknown output fields;
2. the set of needed derivative multi-indices (e.g. u_x, u_xx, b_z) is
   collected across equations, deduped (Schwarz symmetry), and each is
   evaluated with *nested forward-mode* ``jax.jvp`` along unit
   coordinate tangents over the whole ``[B, N]`` point batch at once —
   no per-point loops, no runtime graph building; XLA CSE dedupes the
   shared primal work across the jvp towers;
3. residual expressions are lambdified once into jnp closures over the
   derivative tensors.

Everything under ``__call__`` is pure traced jnp, so the full residual
computation (including all second-order derivatives through the
UNet-latent implicit-grid query) compiles into ONE XLA graph with the
rest of the train step.

Normalization-aware rescaling (the reference folds channel mean/std and
crop physical extents into its equations as constants): declare it once
via ``set_scaling`` — equations are then written in physical units while
the bound forward method operates on normalized coords/fields.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import sympy as sp
from sympy.core.function import AppliedUndef

__all__ = ["PDELayer"]

Array = jnp.ndarray
MultiIndex = Tuple[int, ...]  # sorted coordinate-axis indices, e.g. (0,), (2,2)


def _split_names(csv: str) -> List[str]:
    names = [s.strip() for s in csv.split(",") if s.strip()]
    if not names:
        raise ValueError(f"empty variable list: {csv!r}")
    return names


class PDELayer:
    """Physics-residual layer over a bound forward method.

    Reference parity: ``src/pde.py::PDELayer`` —
    ``add_equation``/``update_forward_method``/``__call__`` keep the
    reference's API surface and the ``dif`` DSL semantics.

    Example::

        layer = PDELayer(in_vars="t, z, x", out_vars="p, b, u, w")
        layer.add_equation("dif(u, x) + dif(w, z) = 0", name="continuity")
        layer.update_forward_method(fwd)   # fwd: [..., 3] -> [..., 4]
        residuals = layer(coords)          # {"continuity": [..., ]}
    """

    def __init__(self, in_vars: str, out_vars: str):
        self.in_var_names = _split_names(in_vars)
        self.out_var_names = _split_names(out_vars)
        self.coord_syms = sp.symbols(self.in_var_names)
        if len(self.in_var_names) == 1:
            self.coord_syms = (self.coord_syms,)
        # Unknown output fields as applied functions of the coordinates.
        self.func_syms = {
            n: sp.Function(n)(*self.coord_syms) for n in self.out_var_names
        }
        self._axis_of_sym = {s: i for i, s in enumerate(self.coord_syms)}
        self._eqs: List[Tuple[str, sp.Expr]] = []
        self._lowered: Optional[List[Tuple[str, Callable, List]]] = None
        self.fwd: Optional[Callable[[Array], Array]] = None
        # Scaling: physical coord extents per axis, output mean/std.
        self._coord_scales: Optional[Sequence[float]] = None
        self._out_means: Optional[Array] = None
        self._out_stds: Optional[Array] = None

    # ------------------------------------------------------------------ API

    def add_equation(self, eqn: str, name: Optional[str] = None) -> None:
        """Add a residual equation in the ``dif`` DSL.

        ``"expr"`` means residual = expr; ``"lhs = rhs"`` means
        residual = lhs - rhs (single ``=`` like the reference).
        """
        if "=" in eqn and "==" not in eqn:
            lhs_s, rhs_s = eqn.split("=", 1)
            expr = self._parse(lhs_s) - self._parse(rhs_s)
        else:
            expr = self._parse(eqn.replace("==", "="))
        name = name or f"eq{len(self._eqs)}"
        self._eqs.append((name, expr))
        self._lowered = None  # re-lower lazily

    def update_forward_method(self, fwd: Callable[[Array], Array]) -> None:
        """Bind the forward method: coords [..., D] -> outs [..., V].

        Coords are in the forward method's own (normalized) units; use
        ``set_scaling`` to declare the physical units of the equations.
        """
        self.fwd = fwd

    def set_scaling(self, coord_scales=None, out_means=None, out_stds=None):
        """Declare normalization between fwd's units and physical units.

        physical coordinate s_a = s0_a + coord_scales[a] * (normalized)
        physical output  y_c = out_means[c] + out_stds[c] * (normalized)

        Residuals are then evaluated in physical units:
        d^k y_c / d s_alpha = out_stds[c] / prod(coord_scales[alpha])
                              * d^k yhat_c / d shat_alpha.
        """
        self._coord_scales = coord_scales
        self._out_means = out_means
        self._out_stds = out_stds

    @property
    def equation_names(self) -> List[str]:
        return [n for n, _ in self._eqs]

    def max_derivative_order(self) -> int:
        """Highest derivative order across all lowered equations."""
        order = 0
        for _, _, atom_keys in self._lower_all():
            for k in atom_keys:
                if isinstance(k, tuple):
                    order = max(order, len(k[1]))
        return order

    def __call__(self, coords: Array, return_outs: bool = False,
                 fwd: Optional[Callable[[Array], Array]] = None,
                 jet=None):
        """Evaluate residuals at coords [..., D] (normalized units).

        Returns dict {name: [...] residual per point}; with
        ``return_outs=True`` also returns the primal outputs [..., V].
        ``fwd`` overrides the bound forward method for this call — the
        purely-functional path used inside jitted train steps (the
        reference's ``update_forward_method`` mutates layer state each
        step; here that is an optional convenience instead).

        ``jet`` (fast path, requires every equation's derivative order
        <= 2): either a callable ``coords -> (outs, jac, hess)`` or a
        precomputed such tuple (``outs [..., V]``, ``jac [..., V, D]``,
        ``hess [..., V, D, D]`` in fwd's normalized units — e.g. from
        :func:`ops.jet.query_local_implicit_grid_jet`). One analytic jet
        replaces all nested-jvp towers.
        """
        lowered = self._lower_all()
        needed = set()
        for _, _, atom_keys in lowered:
            needed.update(k for k in atom_keys if isinstance(k, tuple))
        if jet is not None:
            if self.max_derivative_order() > 2:
                raise ValueError(
                    "jet path supports derivative order <= 2; this "
                    f"system needs order {self.max_derivative_order()}")
            outs, jac, hess = jet(coords) if callable(jet) else jet
            derivs = self._derivs_from_jet(coords, needed, outs, jac, hess)
        else:
            if fwd is None:
                fwd = self.fwd
            if fwd is None:
                raise RuntimeError("call update_forward_method(fwd) first")
            derivs = self._compute_derivs(coords, needed, fwd)

        coords_phys = self._physical_coords(coords)
        residuals = {}
        for name, fn, atom_keys in lowered:
            args = []
            for k in atom_keys:
                if isinstance(k, tuple):
                    var, alpha = k
                    args.append(derivs[(var, alpha)])
                else:  # coordinate symbol -> physical coordinate channel
                    args.append(coords_phys[..., self._axis_by_name(k)])
            residuals[name] = fn(*args)
        if return_outs:
            return residuals, derivs["__outs__"]
        return residuals

    def residual_loss(self, coords: Array,
                      fwd: Optional[Callable[[Array], Array]] = None,
                      jet=None, kind: str = "l2",
                      huber_delta: float = 1.0
                      ) -> Tuple[Array, Dict[str, Array]]:
        """Residual penalty per equation and their sum (the pde loss).

        kind='l2' (reference: mean-square residuals) or 'huber':
        quadratic near zero, LINEAR for |r| > delta — bounds each
        residual's gradient influence, taming the 2nd-order loss
        cliffs a piecewise-linear decoder can hit mid-training (see
        BASELINE.md round-2 spike investigation; same minimizer for
        residuals driven under delta).
        """
        res = self(coords, fwd=fwd, jet=jet)
        if kind == "huber":
            d = huber_delta

            def pen(r):
                a = jnp.abs(r)
                return jnp.mean(jnp.where(a <= d, 0.5 * r * r,
                                          d * (a - 0.5 * d)))
        elif kind == "l2":
            pen = lambda r: jnp.mean(jnp.square(r))
        else:
            raise ValueError(f"unknown pde loss kind: {kind!r}")
        per_eq = {n: pen(r) for n, r in res.items()}
        total = sum(per_eq.values())
        return total, per_eq

    # ------------------------------------------------------------ internals

    def _axis_by_name(self, name: str) -> int:
        return self.in_var_names.index(name)

    def _parse(self, s: str) -> sp.Expr:
        local = {"dif": sp.Derivative}
        local.update({n: self.func_syms[n] for n in self.out_var_names})
        local.update(
            {n: sym for n, sym in zip(self.in_var_names, self.coord_syms)})
        return sp.sympify(s, locals=local)

    def _lower_all(self):
        if self._lowered is None:
            self._lowered = [
                self._lower(name, expr) for name, expr in self._eqs
            ]
        return self._lowered

    def _lower(self, name: str, expr: sp.Expr):
        """Expand derivatives symbolically and lambdify over atoms."""
        expr = expr.doit()

        subs = {}
        atom_keys: List = []
        placeholders: List[sp.Symbol] = []

        def _register(atom, key):
            ph = sp.Symbol(f"__a{len(placeholders)}")
            subs[atom] = ph
            placeholders.append(ph)
            atom_keys.append(key)

        for d in sorted(expr.atoms(sp.Derivative), key=sp.default_sort_key):
            f = d.expr
            if not isinstance(f, AppliedUndef):
                raise ValueError(
                    f"equation {name!r}: derivative of non-output "
                    f"expression remained after expansion: {d}")
            var = f.func.__name__
            if var not in self.out_var_names:
                raise ValueError(f"unknown field {var!r} in {d}")
            alpha: List[int] = []
            for sym, count in d.variable_count:
                if sym not in self._axis_of_sym:
                    raise ValueError(f"dif w.r.t. non-coordinate {sym}")
                alpha.extend([self._axis_of_sym[sym]] * int(count))
            _register(d, (var, tuple(sorted(alpha))))

        for f in sorted(expr.atoms(AppliedUndef), key=sp.default_sort_key):
            if f in subs:
                continue
            var = f.func.__name__
            if var not in self.out_var_names:
                raise ValueError(f"unknown field {var!r}")
            _register(f, (var, ()))

        # Substitute field/derivative atoms first; only genuinely free
        # coordinate symbols remain (u(t,z,x) atoms contain t,z,x too).
        expr = expr.subs(subs)
        free = expr.free_symbols
        for i, sym in enumerate(self.coord_syms):
            if sym in free:
                ph = sp.Symbol(f"__a{len(placeholders)}")
                expr = expr.subs(sym, ph)
                placeholders.append(ph)
                atom_keys.append(self.in_var_names[i])
        fn = sp.lambdify(placeholders, expr, modules=[
            {"sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
             "exp": jnp.exp, "log": jnp.log, "sqrt": jnp.sqrt,
             "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
             "Abs": jnp.abs, "pi": jnp.pi, "Max": jnp.maximum,
             "Min": jnp.minimum, "sign": jnp.sign}, "numpy"])
        return name, fn, atom_keys

    def _physical_coords(self, coords: Array) -> Array:
        if self._coord_scales is None:
            return coords
        return coords * jnp.asarray(self._coord_scales, coords.dtype)

    def _unit_tangent(self, coords: Array, axis: int) -> Array:
        t = jnp.zeros_like(coords)
        return t.at[..., axis].set(1.0)

    def _compute_derivs(self, coords: Array, needed: set, fwd=None):
        """Evaluate all needed derivative tensors with nested jvp.

        needed: set of (var_name, alpha) with alpha a sorted tuple of
        coordinate axes. Returns {(var, alpha): [..., ] array} plus
        "__outs__": primal outputs [..., V] — all in PHYSICAL units per
        ``set_scaling``.
        """
        fwd = fwd or self.fwd
        V = len(self.out_var_names)

        def deriv_fn(alpha: MultiIndex) -> Callable[[Array], Array]:
            f = fwd
            for ax in alpha:
                f = (lambda c, f=f, ax=ax:
                     jax.jvp(f, (c,), (self._unit_tangent(c, ax),))[1])
            return f

        # Group by alpha: one nested-jvp tower gives ALL output vars.
        alphas = sorted({alpha for _, alpha in needed} | {()})
        raw = {alpha: deriv_fn(alpha)(coords) for alpha in alphas}

        stds = (jnp.asarray(self._out_stds, coords.dtype)
                if self._out_stds is not None else None)
        means = (jnp.asarray(self._out_means, coords.dtype)
                 if self._out_means is not None else None)
        scales = (jnp.asarray(self._coord_scales, coords.dtype)
                  if self._coord_scales is not None else None)

        out = {}
        primal = raw[()]
        phys_primal = primal
        if stds is not None:
            phys_primal = phys_primal * stds
        if means is not None:
            phys_primal = phys_primal + means
        out["__outs__"] = phys_primal

        for var, alpha in needed:
            c = self.out_var_names.index(var)
            val = raw[alpha][..., c]
            if alpha == ():
                val = phys_primal[..., c]
            else:
                if stds is not None:
                    val = val * stds[c]
                if scales is not None:
                    denom = jnp.prod(jnp.asarray(
                        [scales[a] for a in alpha], coords.dtype))
                    val = val / denom
            out[(var, alpha)] = val
        assert raw[()].shape[-1] == V
        return out

    def _derivs_from_jet(self, coords: Array, needed: set,
                         outs: Array, jac: Array, hess: Array):
        """Derivative tensors from a precomputed analytic jet.

        outs [..., V], jac [..., V, D], hess [..., V, D, D] are in the
        forward method's normalized units; rescaling to physical units
        matches ``_compute_derivs``.
        """
        stds = (jnp.asarray(self._out_stds, coords.dtype)
                if self._out_stds is not None else None)
        means = (jnp.asarray(self._out_means, coords.dtype)
                 if self._out_means is not None else None)
        scales = (jnp.asarray(self._coord_scales, coords.dtype)
                  if self._coord_scales is not None else None)

        out = {}
        phys_primal = outs
        if stds is not None:
            phys_primal = phys_primal * stds
        if means is not None:
            phys_primal = phys_primal + means
        out["__outs__"] = phys_primal

        for var, alpha in needed:
            c = self.out_var_names.index(var)
            if alpha == ():
                val = phys_primal[..., c]
            else:
                if len(alpha) == 1:
                    val = jac[..., c, alpha[0]]
                elif len(alpha) == 2:
                    val = hess[..., c, alpha[0], alpha[1]]
                else:
                    raise ValueError(
                        f"jet path got order-{len(alpha)} derivative")
                if stds is not None:
                    val = val * stds[c]
                if scales is not None:
                    denom = jnp.prod(jnp.asarray(
                        [scales[a] for a in alpha], coords.dtype))
                    val = val / denom
            out[(var, alpha)] = val
        return out
