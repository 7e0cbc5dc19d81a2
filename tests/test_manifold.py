"""Generic manifold-EKF toolkit tests (filter/manifold.py — the IKFoM
analog): primitive boxplus/boxminus algebra, autodiff Jacobians vs the
hand-coded specialized filter, and an S2 filter the specialized code
cannot express."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rolo_tpu.config import FilterConfig
from rolo_tpu.filter import eskf
from rolo_tpu.filter import manifold as mf
from rolo_tpu.geometry import so3


class TestPrimitives:
    @pytest.mark.parametrize("m,make_x,dim", [
        (mf.Vect(3), lambda r: jnp.asarray(r.normal(size=3), jnp.float32), 3),
        (mf.SO3(), lambda r: so3.exp(jnp.asarray(r.normal(size=3) * 0.5, jnp.float32)), 3),
        (mf.S2(), lambda r: (lambda v: jnp.asarray(v / np.linalg.norm(v), jnp.float32))(r.normal(size=3)), 2),
    ])
    def test_boxplus_boxminus_roundtrip(self, m, make_x, dim):
        r = np.random.default_rng(0)
        for i in range(5):
            x = make_x(r)
            dx = jnp.asarray(r.normal(size=dim) * 0.2, jnp.float32)
            y = m.boxplus(x, dx)
            back = m.boxminus(y, x)
            np.testing.assert_allclose(np.asarray(back), np.asarray(dx), atol=1e-4)
            # and boxplus(x, boxminus(y, x)) == y
            y2 = m.boxplus(x, m.boxminus(y, x))
            np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-5)

    def test_composite_roundtrip(self):
        decl = [("p", mf.Vect(3)), ("r", mf.SO3()), ("g", mf.S2())]
        rng = np.random.default_rng(1)
        x = {
            "p": jnp.asarray(rng.normal(size=3), jnp.float32),
            "r": so3.exp(jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32)),
            "g": jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
        }
        assert mf.tangent_dim(decl) == 8
        dx = jnp.asarray(rng.normal(size=8) * 0.1, jnp.float32)
        y = mf.boxplus(decl, x, dx)
        np.testing.assert_allclose(np.asarray(mf.boxminus(decl, y, x)), np.asarray(dx), atol=1e-4)


POSE_DECL = [
    ("pos", mf.Vect(3)), ("rot", mf.SO3()), ("vel", mf.Vect(3)),
    ("omega", mf.Vect(3)), ("acc", mf.Vect(3)), ("alpha", mf.Vect(3)),
]


def _pose_process(x, dt):
    rot_vec = dt * (x["omega"] + 0.5 * dt * x["alpha"])
    return {
        "pos": x["pos"] + dt * (x["vel"] + 0.5 * dt * x["acc"]),
        "rot": x["rot"] @ so3.exp(rot_vec),
        "vel": x["vel"] + dt * x["acc"],
        "omega": x["omega"] + dt * x["alpha"],
        "acc": x["acc"],
        "alpha": x["alpha"],
    }


def _pose_ekf():
    return mf.GenericEKF(
        decl=POSE_DECL,
        process=_pose_process,
        measure=lambda x: {"pos": x["pos"], "rot": x["rot"]},
        meas_decl=[("pos", mf.Vect(3)), ("rot", mf.SO3())],
    )


def _rand_state(seed):
    rng = np.random.default_rng(seed)
    cfg = FilterConfig()
    st = eskf.init_filter(cfg)
    st = st._replace(
        pos=jnp.asarray(rng.normal(size=3), jnp.float32),
        rot=so3.exp(jnp.asarray(rng.normal(size=3) * 0.4, jnp.float32)),
        vel=jnp.asarray(rng.normal(size=3), jnp.float32),
        omega=jnp.asarray(rng.normal(size=3) * 0.5, jnp.float32),
        acc=jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32),
        alpha=jnp.asarray(rng.normal(size=3) * 0.2, jnp.float32),
        initialized=jnp.asarray(True),
    )
    return st, cfg


def _to_dict(st):
    return {k: getattr(st, k) for k, _ in POSE_DECL}


class TestGenericVsSpecialized:
    def test_predict_parity(self):
        """The autodiff F (through boxminus) must reproduce the hand-coded
        process Jacobian of filter/eskf.py (esekfom.hpp:275-403): same
        predicted mean AND covariance given the same Q."""
        st, cfg = _rand_state(2)
        dt = 0.1
        ref = eskf.predict(st, dt, cfg)

        ekf = _pose_ekf()
        qlin = (dt * cfg.q_linear_jerk_std) ** 2
        qang = (dt * cfg.q_angular_jerk_std) ** 2
        q = jnp.diag(jnp.zeros(18).at[12:15].set(qlin).at[15:18].set(qang))
        x, p = mf.predict(ekf, _to_dict(st), st.cov, q, dt)

        np.testing.assert_allclose(np.asarray(x["pos"]), np.asarray(ref.pos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x["rot"]), np.asarray(ref.rot), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p), np.asarray(ref.cov), rtol=2e-2, atol=2e-4)

    def test_update_parity(self):
        """Iterating the gain (generic, reference esekfom semantics) vs the
        specialized filter's fixed K: with H = [I6|0] independent of the
        state, the gain is constant across iterates, so both converge to
        the same update — the documented justification for eskf.py's
        fixed-K iteration (VERDICT round-3 weak item 7)."""
        st, cfg = _rand_state(3)
        rng = np.random.default_rng(4)
        z_pos = st.pos + jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32)
        z_rot = st.rot @ so3.exp(jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32))
        ref = eskf.update_iterated(st, z_pos, z_rot, cfg)

        ekf = _pose_ekf()
        r = jnp.diag(jnp.concatenate([
            jnp.full((3,), cfg.r_position_std**2),
            jnp.full((3,), cfg.r_rotation_std**2),
        ]))
        x, p = mf.update_iterated(
            ekf, _to_dict(st), st.cov, {"pos": z_pos, "rot": z_rot}, r,
            iterations=cfg.maximum_iteration,
        )
        np.testing.assert_allclose(np.asarray(x["pos"]), np.asarray(ref.pos), atol=2e-3)
        rot_diff = so3.log(jnp.asarray(x["rot"]).T @ ref.rot)
        assert float(jnp.linalg.norm(rot_diff)) < 2e-3
        np.testing.assert_allclose(np.asarray(p), np.asarray(ref.cov), rtol=5e-2, atol=5e-4)


class TestS2Filter:
    def test_gravity_direction_converges(self):
        """A filter the specialized 18-DoF code cannot express: estimate a
        unit direction (S2, 2-dof) from noisy direction measurements — the
        MTK S2 use case (mtk/types/S2.hpp)."""
        decl = [("g", mf.S2())]
        ekf = mf.GenericEKF(
            decl=decl, process=lambda x, dt: x,
            measure=lambda x: {"g": x["g"]}, meas_decl=[("g", mf.S2())],
        )
        truth = np.array([0.3, -0.4, 0.866], np.float32)
        truth /= np.linalg.norm(truth)
        x = {"g": jnp.asarray([0.0, 0.0, 1.0], jnp.float32)}
        p = jnp.eye(2) * 1.0
        q = jnp.eye(2) * 1e-6
        r = jnp.eye(2) * 0.05
        rng = np.random.default_rng(5)
        for i in range(25):
            x, p = mf.predict(ekf, x, p, q, 0.1)
            zv = truth + rng.normal(size=3).astype(np.float32) * 0.05
            zv /= np.linalg.norm(zv)
            x, p = mf.update_iterated(ekf, x, p, {"g": jnp.asarray(zv)}, r, iterations=2)
        err = float(np.degrees(np.arccos(np.clip(np.dot(np.asarray(x["g"]), truth), -1, 1))))
        assert err < 3.0, err
        assert float(jnp.trace(p)) < 0.1
