"""IO-layer tests: parsers, config schema, ID joins (reference contract
main.m:51-384, ReadFiles.m, findSetting.m)."""

import math
import textwrap

import numpy as np
import pytest

from fish_eye_bundle_adjustment_tpu.config import (
    ConfigError,
    Settings,
    parse_cfg_text,
    settings_from_dict,
)
from fish_eye_bundle_adjustment_tpu.io import readers
from fish_eye_bundle_adjustment_tpu.io.problem import build_problem
from fish_eye_bundle_adjustment_tpu.io.readers import DatasetError


MINIMAL_CFG = """
# comment line
Iteration_Cap	10
Threshold_Value	0.001
Inner_Constraints	0
Estimate_Xc	1
Estimate_Yc	1
Estimate_Zc	1
Estimate_Omega	1
Estimate_Phi	1
Estimate_Kappa	1
Estimate_xp	0
Estimate_yp	0
Estimate_c	0
Estimate_Radial_Distortions	0
Num_Radial_Distortions 3
Estimate_Decentering_Distortions	0
Estimate_tie	0
Estimate_AllGCP	0
"""


class TestConfig:
    def test_minimal(self):
        s = settings_from_dict(parse_cfg_text(MINIMAL_CFG))
        assert s.iteration_cap == 10
        assert s.threshold == 0.001
        assert s.model == "fisheye"  # default Type (main.m:135-137)
        assert s.meas_std == 1.0  # default (main.m:125-127)
        assert s.u_per_image == 6
        assert s.u_per_camera == 0

    def test_missing_required_raises(self):
        kv = parse_cfg_text(MINIMAL_CFG)
        del kv["Iteration_Cap"]
        with pytest.raises(ConfigError, match="Iteration_Cap"):
            settings_from_dict(kv)

    def test_bool_validation(self):
        kv = parse_cfg_text(MINIMAL_CFG)
        kv["Estimate_Xc"] = "2"
        with pytest.raises(ConfigError, match="must be 1 or 0"):
            settings_from_dict(kv)

    def test_quoted_type(self):
        kv = parse_cfg_text(MINIMAL_CFG + "\nType\t'equisolid'")
        assert settings_from_dict(kv).model == "equisolid"

    def test_invalid_type(self):
        kv = parse_cfg_text(MINIMAL_CFG + "\nType\t'warp'")
        with pytest.raises(ConfigError, match="invalid Type"):
            settings_from_dict(kv)

    def test_num_radial_clamped_to_one(self):
        # BuildAwG.m:18-20
        kv = parse_cfg_text(MINIMAL_CFG)
        kv["Num_Radial_Distortions"] = "0"
        assert settings_from_dict(kv).num_radial_distortions == 1

    def test_meas_std_y(self):
        kv = parse_cfg_text(MINIMAL_CFG + "\nMeas_std 0.5\nMeas_std_y 0.7")
        s = settings_from_dict(kv)
        assert s.meas_std == 0.5 and s.meas_std_y == 0.7


class TestReaders:
    def test_ext_degrees_to_radians(self, tmp_path):
        f = tmp_path / "a.ext"
        f.write_text("img1 cam0 10.0 20.0 30.0 90.0 -45.0 180.0\n")
        ext = readers.read_ext(f)
        assert ext.image_ids == ["img1"]
        np.testing.assert_allclose(
            ext.eops[0], [10, 20, 30, math.pi / 2, -math.pi / 4, math.pi]
        )

    def test_int_missing_distortions_zero(self, tmp_path):
        # main.m:243-254: absent k/p coefficients default to 0
        f = tmp_path / "a.int"
        f.write_text("cam0 -1 0 0 100 80\n1.0 2.0 50.0 1e-3\n")
        d = readers.read_int(f, num_radial=3)
        np.testing.assert_allclose(d.xp_yp_c[0], [1.0, 2.0, 50.0])
        np.testing.assert_allclose(d.k[0], [1e-3, 0.0, 0.0])
        np.testing.assert_allclose(d.p[0], [0.0, 0.0])
        # rmax = half-diagonal (BuildAwG.m:422-425)
        np.testing.assert_allclose(d.rmax[0], math.hypot(50, 40))

    def test_int_bad_ydir(self, tmp_path):
        f = tmp_path / "a.int"
        f.write_text("cam0 2 0 0 100 80\n1 2 50\n")
        with pytest.raises(DatasetError, match="y_axis_dir"):
            readers.read_int(f, num_radial=1)

    def test_comments_and_blank_lines(self, tmp_path):
        f = tmp_path / "a.cnt"
        f.write_text("# header\n\nT1 1.0 2.0 3.0\n  # another\nT2 4 5 6\n")
        cnt = readers.read_cnt(f)
        assert cnt.target_ids == ["T1", "T2"]

    def test_discover_requires_unique(self, tmp_path):
        (tmp_path / "a.pho").write_text("T1 I1 0 0\n")
        (tmp_path / "b.pho").write_text("T1 I1 0 0\n")
        with pytest.raises(DatasetError, match="multiple"):
            readers.discover_dataset(tmp_path, extensions=(".pho",))


def _tiny_inputs():
    pho = readers.PhoData.from_rows(
        ["T1", "T2", "T1"],
        ["I1", "I1", "I2"],
        np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]),
    )
    ext = readers.ExtData(
        ["I1", "I2"], ["C", "C"], np.zeros((2, 6))
    )
    cnt = readers.CntData(["T1", "T2"], np.arange(6.0).reshape(2, 3))
    int_ = readers.IntData(
        ["C"],
        np.array([-1.0]),
        np.array([[0.0, 0.0, 10.0, 10.0]]),
        np.array([[0.0, 0.0, 5.0]]),
        np.zeros((1, 1)),
        np.zeros((1, 2)),
    )
    return pho, ext, cnt, int_


class TestJoin:
    def _settings(self, **kw):
        kv = parse_cfg_text(MINIMAL_CFG)
        s = settings_from_dict(kv)
        return Settings(**{**s.__dict__, "num_radial_distortions": 1, **kw})

    def test_join_indices(self):
        pho, ext, cnt, int_ = _tiny_inputs()
        prob = build_problem(pho, ext, cnt, int_, None, self._settings())
        np.testing.assert_array_equal(prob.obs_img, [0, 0, 1])
        np.testing.assert_array_equal(prob.obs_pt, [0, 1, 0])
        np.testing.assert_array_equal(prob.obs_cam, [0, 0, 0])
        assert prob.n == 6
        assert prob.num_gcp == 2
        assert prob.n_tie == 0

    def test_tie_slots(self):
        pho, ext, cnt, int_ = _tiny_inputs()
        prob = build_problem(
            pho, ext, cnt, int_, ["T2"], self._settings(estimate_tie=True)
        )
        np.testing.assert_array_equal(prob.tie_target_idx, [1])
        np.testing.assert_array_equal(prob.target_tie_slot, [-1, 0])
        np.testing.assert_array_equal(prob.obs_is_tie, [False, True, False])

    def test_all_gcp(self):
        pho, ext, cnt, int_ = _tiny_inputs()
        prob = build_problem(
            pho, ext, cnt, int_, None, self._settings(estimate_all_gcp=True)
        )
        assert prob.tie_ids == ["T1", "T2"]  # sorted-unique (main.m:261-264)

    def test_unknown_image_raises(self):
        pho, ext, cnt, int_ = _tiny_inputs()
        pho = readers.PhoData.from_rows(
            pho.target_ids, ["NOPE"] + pho.image_ids[1:], pho.xy
        )
        with pytest.raises(DatasetError, match="image 'NOPE'"):
            build_problem(pho, ext, cnt, int_, None, self._settings())

    def test_missing_tie_in_cnt(self):
        pho, ext, cnt, int_ = _tiny_inputs()
        with pytest.raises(DatasetError, match="tie point 'T9'"):
            build_problem(
                pho, ext, cnt, int_, ["T9"], self._settings(estimate_tie=True)
            )


class TestCam0(object):
    def test_cam0_counts(self, cam0_problem):
        # main.m:379-383 / SURVEY.md problem size
        p = cam0_problem
        assert p.n_img == 42
        assert p.n_cam == 1
        assert p.n_targets == 109
        assert p.n_tie == 106
        assert p.n_obs == 1029
        assert p.n == 2058
        assert p.num_gcp == 109
