"""Generic measurement-error residuals.

Reference parity: ``SimpleError2/3/4`` (src/residual.jl:3-41) — residuals of
the form ``generatemeasurement(vars...) − measurement``.  Here a single
higher-order helper covers any dependency count: the measurement is the
per-cost ``params`` and the generator is a user function of the variable
values.
"""

from __future__ import annotations


def measurement_residual(generate_fn):
    """Wrap ``generate_fn(*values) -> prediction`` into a residual
    ``prediction − measurement`` usable with ``add_cost``/``add_cost_batch``
    (measurement passed as ``params``)."""

    def residual(measurement, *values):
        return generate_fn(*values) - measurement

    residual.__name__ = f"measurement_residual_{getattr(generate_fn, '__name__', 'fn')}"
    return residual
