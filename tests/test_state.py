"""State serialization round-trip + error guard."""

import numpy as np
import pytest

from arctic_tpu.core.scene import default_scene_params, default_settings
from arctic_tpu.utils import serialize
from arctic_tpu.utils.errors import RenderError, render_guard


def test_state_roundtrip(tmp_path):
    params, settings = default_scene_params(), default_settings()
    p = tmp_path / "state.json"
    serialize.save_state(str(p), params, settings)
    loaded_params, loaded_settings = serialize.load_state(str(p))
    np.testing.assert_allclose(np.asarray(loaded_params.camera.eye), [0, 5, 0])
    np.testing.assert_allclose(
        np.asarray(loaded_params.sun.position), np.asarray(params.sun.position)
    )
    assert int(loaded_params.point_lights.count) == 1
    np.testing.assert_allclose(np.asarray(loaded_params.point_lights.color[0]), [10, 0, 0])
    assert float(loaded_settings.gamma) == pytest.approx(2.2)


def test_render_guard_annotates():
    with pytest.raises(RenderError, match="sponza.*ValueError.*boom"):
        with render_guard("sponza 1080p"):
            raise ValueError("boom")
