"""Failure handling (SURVEY.md §5.3): fail-fast with context, like the
reference's DXERR + try/catch wall (dxerr.hpp:5-10, main.cpp:43-65).

XLA errors (OOM, compile failures) are opaque about *which scene* caused
them; render_guard re-raises with scene/config context attached."""

from __future__ import annotations

import contextlib
import logging

log = logging.getLogger("arctic")


class RenderError(RuntimeError):
    pass


@contextlib.contextmanager
def render_guard(description: str):
    """Wrap a render/compile call; annotate and re-raise failures."""
    try:
        yield
    except Exception as e:  # noqa: BLE001 — the catch-all wall is the point
        msg = f"render failed ({description}): {type(e).__name__}: {e}"
        log.error(msg)
        raise RenderError(msg) from e


def enable_debug_checks() -> None:
    """Debug mode (SURVEY.md §5.2): the D3D debug-layer analogue.

    Turns on jax NaN/inf checking — every primitive's output is verified,
    which catches shading math blowups at their source at a large slowdown.
    """
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
