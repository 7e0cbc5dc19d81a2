"""Full SLAM system driver: the TPU equivalent of `roslaunch rolo
rolo_run.launch`.

The reference runs five processes on a ROS bus
(/root/reference/launch/module_loam.launch, module_prior.launch); here the
whole per-scan pipeline — range-image projection, LOAM features, rot-GICP
front-end, ESKF fusion, back-end mapping, loop closure, ground priors —
is a handful of jitted programs driven by this host-side class at the
reference cadences (mapping >= mappingProcessInterval, loops at
loopClosureFrequency, priors at priorFactorFrequency; SURVEY.md
sections 2.7, 3).

Host<->device traffic is one scan in, one pose out per step; all SLAM
state lives on device as pytrees (the checkpoint/resume unit).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RoloConfig
from ..filter import fusion
from ..frontend import odometry
from ..geometry import so3
from ..mapping import backend
from ..pointcloud import features as feats
from ..pointcloud.cloud import PaddedCloud, concat_clouds
from ..pointcloud.projection import RawScan, project_scan
from ..prior import association as prior_assoc
from ..prior import ground as prior_ground
from ..prior import vehicle as prior_vehicle
from . import io as rio
from .profiling import StageTimers


def infer_rings(xyz: np.ndarray, n_scan: int, fov_up_deg: float = 15.0, fov_down_deg: float = -25.0) -> np.ndarray:
    """Ring index from vertical angle for sensors without a ring field
    (the reference requires `ring`; this helper widens ingest to plain
    xyz clouds like KITTI .bin)."""
    d = np.linalg.norm(xyz[:, :2], axis=1)
    ang = np.degrees(np.arctan2(xyz[:, 2], np.maximum(d, 1e-9)))
    frac = (fov_up_deg - ang) / max(fov_up_deg - fov_down_deg, 1e-6)
    return np.clip((frac * (n_scan - 1)).round(), 0, n_scan - 1).astype(np.int32)


def infer_rel_time(xyz: np.ndarray, scan_period: float) -> np.ndarray:
    """Per-point time from azimuth sweep (deskewCloudInfo fallback,
    imageProjection.cpp:266-366: orientation span mapped to scanPeriod)."""
    ang = np.arctan2(xyz[:, 1], xyz[:, 0])
    rel = (ang[0] - ang) % (2.0 * math.pi)
    return (rel / (2.0 * math.pi) * scan_period).astype(np.float32)


class CapacityExhausted(RuntimeError):
    """A fixed-capacity store dropped an event and
    StaticConfig.on_capacity == "error"."""


_DROP_CATEGORIES = ("keyframes", "loop_factors", "prior_factors", "prior_queue_overwrites")


class SlamSystem:
    """One SLAM session over a scan stream.

    Usage:
        slam = SlamSystem(RoloConfig())
        for stamp, points in scans:
            pose = slam.process_scan(points, stamp)
        slam.save_results("/tmp/out")
    """

    def __init__(self, cfg: RoloConfig = RoloConfig(), dtype=jnp.float32):
        self.cfg = cfg
        st = cfg.static
        self.odom_state = odometry.init_state(st.max_feature_points, dtype)
        self.fusion_state = fusion.init_fusion(cfg.filter, dtype)
        self.backend_state = backend.init_backend(cfg, dtype)
        self.vehicle = prior_vehicle.from_config(cfg.prior, dtype)
        # external /voxel_map input (set_ground_map); when absent the
        # self-built live ground map below feeds the prior stack
        self.ground_map: Optional[prior_ground.GroundMap] = None
        self.live_ground = prior_ground.init_live_ground(
            st.live_ground_slots, st.live_ground_slot_points, dtype
        )

        ground_rings = cfg.prior.ground_seg_rings or cfg.sensor.n_scan // 2

        @jax.jit
        def _ground_update_jit(live, ring_img, rot, trans):
            from ..pointcloud.ground_seg import segment_ground

            g = segment_ground(
                ring_img, cfg.sensor.horizon_scan, ground_rings,
                cfg.prior.ground_seg_slope_deg,
                out_capacity=st.live_ground_slot_points * 4,
            )
            return prior_ground.update_live_ground(
                live, g, rot, trans, st.live_ground_slot_points
            )

        self._ground_update_jit = _ground_update_jit

        self._last_mapping_time = -np.inf
        self._last_loop_time = -np.inf
        self._last_prior_time = -np.inf
        self._last_stamp: Optional[float] = None
        # Stamps are rebased to the first scan: device time is f32, whose
        # resolution at UNIX-epoch magnitudes (~1.7e9 s) is worse than a
        # whole scan period.
        self._epoch: Optional[float] = None

        # per-stage wall-clock metrics (the reference's solver printf
        # timers, lidarOdometry.cpp:476-498, made structured).
        # sync_stages=False (default): stages time DISPATCH only — fastest
        # end-to-end, but per-stage ms are not device-true (the first
        # synced point absorbs every queued program). Set True for
        # profiling runs: each stage blocks on its own outputs, so
        # stage_ms attribute device time correctly at an end-to-end cost.
        self.timers = StageTimers()
        self.sync_stages = False

        # capacity-exhaustion accounting (BackendState.dropped_counts read
        # back after backend-touching steps; see StaticConfig.on_capacity)
        self.drop_counts = dict.fromkeys(_DROP_CATEGORIES, 0)
        self._warned_drops = set()

        # externally injected loop pairs, (time_cur, time_prev) raw stamps
        # (the loop_info Float64MultiArray input of
        # detectLoopClosureExternal, backMapping.cpp:2517-2570)
        self._external_loops: List[tuple] = []

        # trajectory logs: device arrays, stacked + transferred ONCE at
        # egress (front_positions_np() etc.) — per-scan host conversion
        # would synchronize the tunnel every scan
        self.times: List[float] = []
        self.front_positions: List[jnp.ndarray] = []
        self.front_quats: List[jnp.ndarray] = []
        self.mapped_positions: List[jnp.ndarray] = []
        self.mapped_quats: List[jnp.ndarray] = []
        # fused high-rate pose stream (TransformFusion fusionTimerHandler,
        # lidarOdometry.cpp:137-250): mapping ∘ (front_anchor⁻¹ ∘ ESKF-now)
        # — the pose a robot consumer would actually subscribe to
        self.fused_positions: List[jnp.ndarray] = []
        self.fused_quats: List[jnp.ndarray] = []
        self.fused_valid: List[jnp.ndarray] = []
        self._mapping_steps = 0
        self._last_capacity_check = 0
        # in-flight dropped_counts snapshot (fetch-deferred capacity check)
        self._pending_capacity = None
        # background-task scheduler state (see process_scan): pending
        # cadence work + scans the queue head has been deferred
        self._bg_queue: List[str] = []
        self._bg_deferred = 0
        # host-side solve scheduling: True when a loop/prior/external
        # program has been dispatched since the last graph solve
        self._graph_dirty = False
        self._next_solve_check = 0.0

        if cfg.sensor.deskew_enabled:
            # full deskew from the last odometry increment
            # (deskewCloudInfo/deskewPoint, imageProjection.cpp:266-396,
            # plus the translational correction the reference zeroes)
            self._project = jax.jit(
                lambda scan, rpy, vel, diff: project_scan(
                    scan, cfg.sensor.n_scan, cfg.sensor.horizon_scan,
                    cfg.sensor.lidar_min_range, cfg.sensor.lidar_max_range,
                    cfg.sensor.downsample_rate, deskew_rpy=rpy,
                    odom_time_diff=diff, deskew_vel=vel,
                )
            )
        else:
            self._project = jax.jit(
                lambda scan: project_scan(
                    scan, cfg.sensor.n_scan, cfg.sensor.horizon_scan,
                    cfg.sensor.lidar_min_range, cfg.sensor.lidar_max_range,
                    cfg.sensor.downsample_rate,
                )
            )
        @jax.jit
        def _deskew_increment(odom_state, fusion_state, interval):
            """Deskew increment for the upcoming sweep, in the step
            convention (step maps prev->cur frame; projection applies
            -rpy * ratio and +vel * ratio).

            Feeding the raw last registration step back into deskew is
            unstable: a step error warps the next scan, which biases the
            next step — measured gain > 1, diverging to a limit cycle of
            about one sweep-rotation (AB_STUDY round-2 deskew variant). The
            ESKF-smoothed body rates/velocity (constant-jerk prior tempering
            the measurement stream, filter/eskf.py) break that loop."""
            f = fusion_state.filter
            use_filter = f.initialized
            # step_rot ~ Exp(-omega dt) (omega is the body rate of
            # rot' = rot Exp(dt omega)); displacement in the sweep-start
            # frame ~ R^T vel dt
            rot_f = so3.exp(-f.omega * interval)
            vel_f = (f.rot.T @ f.vel) * interval
            rot_o = odom_state.step_rot
            vel_o = -odom_state.step_rot.T @ odom_state.step_trans
            rot = jnp.where(use_filter, rot_f, rot_o)
            vel = jnp.where(use_filter, vel_f, vel_o)
            return jnp.stack(so3.matrix_to_rpy(rot)), vel

        self._deskew_increment = _deskew_increment

        self._extract = jax.jit(
            lambda ring: feats.extract_features(
                ring, cfg.features.edge_threshold, cfg.features.surf_threshold,
                cfg.features.odometry_surf_leaf_size,
                st.max_corner_points, st.max_surf_points,
            )
        )

        # Zero-synchronization driving: on a remote-tunneled device every
        # host value fetch fences the whole dispatch queue (~25 ms idle,
        # ~0.5 s with the async driver running deep), so the steady-state
        # per-scan path contains NO blocking fetch at all — the graph solve
        # is scheduled from host-side dispatch knowledge (_graph_dirty +
        # mapping-step count), and trajectory egress stacks device arrays
        # once at the end of the run.
        self._quat = jax.jit(so3.matrix_to_quat)

        @jax.jit
        def _prior_cycle_jit(fusion_state, stamp, backend_state, ground_map, vehicle):
            """The whole predictTimerHandler -> prior_pose_node ->
            priorInfoHandler -> performPriorAssociation chain (SURVEY.md
            section 3.4) as ONE device program — zero host branches."""
            fut = fusion.predict_future(fusion_state, cfg.filter)
            fused = fusion.fused_pose(fusion_state, stamp, cfg.filter)
            valid = fut.valid & fused.valid
            local_rot = so3.quat_to_matrix(fut.final_quat)
            world_pos = fused.rot @ fut.final_pos + fused.trans
            world_rot = fused.rot @ local_rot
            yaw = jnp.arctan2(world_rot[1, 0], world_rot[0, 0])
            obs = prior_assoc.compute_prior(
                ground_map, vehicle, world_pos[0], world_pos[1], yaw, cfg.prior, 2048
            )
            obs = obs._replace(success=obs.success & valid)
            backend_state = backend.record_prior_observation(
                backend_state, obs, obs_time=stamp, cfg=cfg
            )
            patch = prior_ground.extract_patch(
                ground_map, backend_state.xyz[:2],
                4.0 * cfg.prior.ground_patch_size, 4096,
            )
            backend_state, matched = backend.prior_step(backend_state, patch, cfg)
            return backend_state, matched

        self._prior_cycle_jit = _prior_cycle_jit

    # -- ingest ----------------------------------------------------------

    def set_ground_map(self, points: np.ndarray) -> None:
        """External ground mapping input (the "/voxel_map" topic from the
        point_seg ground_mapping node, launch/module_prior.launch:9)."""
        cap = 1 << int(np.ceil(np.log2(max(len(points), 1))))
        cloud = PaddedCloud.from_points(points, cap)
        self.ground_map = prior_ground.GroundMap(cloud.xyz, cloud.mask)

    def inject_loop(self, time_cur: float, time_prev: float) -> None:
        """Queue an externally detected loop pair by raw timestamps — the
        `loop_info` std_msgs input of detectLoopClosureExternal
        (backMapping.cpp:2517-2570). Verified by ICP at the next
        loop-closure tick."""
        self._external_loops.append((float(time_cur), float(time_prev)))

    def _make_raw_scan(self, points: np.ndarray, ring: Optional[np.ndarray], rel_time: Optional[np.ndarray]) -> RawScan:
        cfg = self.cfg
        cap = cfg.static.max_raw_points
        pts = np.asarray(points, np.float32).reshape(-1, points.shape[-1])
        xyz = pts[:, :3]
        if ring is None:
            ring = infer_rings(xyz, cfg.sensor.n_scan)
        if rel_time is None:
            rel_time = infer_rel_time(xyz, cfg.sensor.scan_period)
        m = min(len(xyz), cap)
        xyz_p = np.zeros((cap, 3), np.float32)
        ring_p = np.zeros((cap,), np.int32)
        t_p = np.zeros((cap,), np.float32)
        mask = np.zeros((cap,), bool)
        xyz_p[:m] = xyz[:m]
        ring_p[:m] = ring[:m]
        t_p[:m] = rel_time[:m]
        mask[:m] = True
        return RawScan(jnp.asarray(xyz_p), jnp.asarray(ring_p), jnp.asarray(t_p), jnp.asarray(mask))

    # -- main per-scan entry ---------------------------------------------

    def process_scan(
        self,
        points: np.ndarray,
        stamp: float,
        ring: Optional[np.ndarray] = None,
        rel_time: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Push one scan through the pipeline; returns the front-end and
        (when the mapping cadence fired) mapped poses."""
        cfg = self.cfg
        if self._epoch is None:
            self._epoch = stamp
        stamp = stamp - self._epoch
        interval = (
            cfg.sensor.scan_period if self._last_stamp is None else max(stamp - self._last_stamp, 1e-3)
        )
        self._last_stamp = stamp

        prof = self.sync_stages  # device-true per-stage attribution
        with self.timers.stage("ingest"):
            scan = self._make_raw_scan(points, ring, rel_time)
        with self.timers.stage("project+features", sync=(lambda: feat.xyz) if prof else None):
            if cfg.sensor.deskew_enabled:
                step_rpy, step_vel = self._deskew_increment(
                    self.odom_state, self.fusion_state,
                    jnp.asarray(interval, jnp.float32),
                )
                ring_img = self._project(
                    scan, step_rpy, step_vel, jnp.asarray(interval, jnp.float32)
                )
            else:
                ring_img = self._project(scan)
            fc = self._extract(ring_img)
            feat = concat_clouds(fc.corners, fc.surfaces, cfg.static.max_feature_points)

        # front-end odometry. No sync in throughput mode: with the
        # poll-based solve gate above there is NO blocking host fetch
        # anywhere in the steady-state per-scan path — XLA's bounded
        # in-flight execution queue throttles dispatch-ahead.
        with self.timers.stage("frontend", sync=(lambda: odom_out.pose_trans) if prof else None):
            self.odom_state, odom_out = odometry.scan_step(
                self.odom_state, feat.xyz, feat.mask, jnp.asarray(interval, feat.xyz.dtype),
                cfg.registration, cfg.static.max_voxels, cfg.registration.k_correspondences,
                enable_failure_gate=cfg.registration.enable_failure_gate,
            )
        front_rot = odom_out.pose_rot
        front_trans = odom_out.pose_trans

        # ESKF fusion measurement
        self.fusion_state, _ = fusion.on_front_odometry(
            self.fusion_state, jnp.asarray(stamp), front_rot, front_trans, cfg.filter
        )

        # `out` carries DEVICE arrays: converting them would synchronize
        # (flat ~25-30 ms each on a tunneled device); callers that need
        # host values np.asarray()/bool() them on demand.
        out: Dict[str, np.ndarray] = {
            "front_rot": front_rot,
            "front_trans": front_trans,
        }

        # back-end at mappingProcessInterval (backMapping.cpp:436)
        if stamp - self._last_mapping_time >= cfg.mapping.mapping_process_interval:
            self._last_mapping_time = stamp
            # raw projected cloud for scan-context (scan_raw input type)
            raw_valid = ring_img.mask.reshape(-1)
            raw_cloud = PaddedCloud(ring_img.xyz.reshape(-1, 3), raw_valid)
            sc_cloud = (
                raw_cloud if cfg.loop.sc_input_type == "scan_raw" else fc.surfaces
            )
            with self.timers.stage("backend", sync=(lambda: map_out.trans) if prof else None):
                self.backend_state, map_out = backend.backend_step(
                    self.backend_state, fc.corners, fc.surfaces, sc_cloud,
                    front_rot, front_trans, jnp.asarray(True), jnp.asarray(stamp), cfg,
                )
            mapped_rot, mapped_trans = map_out.rot, map_out.trans
            self.fusion_state = fusion.on_mapping_odometry(
                self.fusion_state, mapped_rot, mapped_trans, front_rot, front_trans
            )
            out["mapped_rot"] = mapped_rot
            out["mapped_trans"] = mapped_trans
            out["keyframe_added"] = map_out.keyframe_added
            # live ground mapping at the mapping cadence (groundMapHandler
            # analog): segmented ground at the freshly mapped pose
            if cfg.prior.enable and self.ground_map is None:
                self.live_ground = self._ground_update_jit(
                    self.live_ground, ring_img, mapped_rot, mapped_trans
                )
            self.mapped_positions.append(mapped_trans)
            self.mapped_quats.append(self._quat(mapped_rot))
            self._mapping_steps += 1

        # fused pose publication (fusionTimerHandler, lidarOdometry.cpp:
        # 137-250): one fused sample per scan, async like everything else.
        # The reference publishes at 20 Hz wall-clock; per-scan sampling is
        # the same rate at the 10 Hz design point scan stream given that
        # the filter state only changes on scan arrival here.
        fp = fusion.fused_pose(self.fusion_state, jnp.asarray(stamp), cfg.filter)
        out["fused_rot"] = fp.rot
        out["fused_trans"] = fp.trans
        out["fused_valid"] = fp.valid
        self.fused_positions.append(fp.trans)
        self.fused_quats.append(self._quat(fp.rot))
        self.fused_valid.append(fp.valid)

        # Publication point. Everything below is background-cadence work
        # (the reference runs it in detached threads: loopClosureThread @
        # 1 Hz, priorThread @ 5 Hz, backMapping.cpp:2710-2712; loop
        # corrections reach consumers asynchronously via correctPoses on a
        # LATER keyframe path, :1287-1320). On a single in-order TPU
        # execution queue the analog is dispatch order: the pose outputs'
        # device->host copies are started FIRST (copy_to_host_async), so a
        # consumer's pose fetch never queues behind a loop verification /
        # prior cycle / graph solve — those execute in the inter-scan idle
        # gap of a real-time stream (~90 ms at the 10 Hz design point;
        # tools/bench_latency.py --realtime measures exactly this).
        for _a in out.values():
            if hasattr(_a, "copy_to_host_async"):
                _a.copy_to_host_async()

        # Background-cadence scheduling (loopClosureThread @ 1 Hz,
        # priorThread @ 5 Hz, iSAM solve — backMapping.cpp:2710-2712).
        # Cadence ticks only ENQUEUE work; at most ONE background program
        # is dispatched per scan, and preferentially on scans where the
        # mapping cadence did NOT fire — the host knows both cadences, so
        # the expensive programs (loop verify ~80 ms, graph solve
        # 45-815 ms by bucket) never stack on top of a backend_step on the
        # in-order device queue. A task waits at most BG_MAX_DEFER scans
        # (0.1 s each at the design point) before being dispatched
        # regardless — bounded staleness, far inside the reference's own
        # thread-scheduling jitter at 1 Hz / 5 Hz cadences.
        #
        # The pose-graph solve gate stays fetch-free: loop/prior/external
        # programs are the ONLY sources of new non-odometry factors, and
        # the host knows exactly when it dispatched one (_graph_dirty) —
        # fetching the device's solve_due flag would fence the whole
        # dispatch queue (~0.5 s measured with the driver ~10 scans deep).
        # A solve with no accepted factors is a cheap no-op, and its
        # bucket comes from the host-side mapping-step count. Corrections
        # apply asynchronously to publication exactly like the reference
        # (correctPoses on a later keyframe path, backMapping.cpp:1287).
        if cfg.loop.enable and stamp - self._last_loop_time >= 1.0 / cfg.loop.frequency_hz:
            self._last_loop_time = stamp
            if "loop" not in self._bg_queue:
                self._bg_queue.append("loop")
        # the prior cycle is cheap on device (~1-2 ms dispatch, tens of ms
        # synced — one compute_prior + patch-ICP program) and runs at 5 Hz;
        # occupying a scheduler slot with it would starve the expensive
        # tasks (loop verify ~80 ms, solve 45-815 ms) onto mapping scans.
        # Dispatch it inline at its cadence instead.
        if (
            cfg.prior.enable
            and (self.ground_map is not None or self._mapping_steps >= 1)
            and stamp - self._last_prior_time >= 1.0 / cfg.prior.frequency_hz
        ):
            self._last_prior_time = stamp
            self._dispatch_background("prior", stamp, out, prof)
        if (
            self._graph_dirty
            and self._mapping_steps >= 1
            and stamp >= self._next_solve_check
        ):
            self._next_solve_check = stamp + cfg.mapping.graph_solve_check_interval
            self._graph_dirty = False
            if "solve" not in self._bg_queue:
                self._bg_queue.append("solve")

        mapping_fired = "mapped_trans" in out
        if self._bg_queue and (not mapping_fired or self._bg_deferred >= self.BG_MAX_DEFER):
            self._bg_deferred = 0
            self._dispatch_background(self._bg_queue.pop(0), stamp, out, prof)
        elif self._bg_queue:
            self._bg_deferred += 1

        # capacity accounting at a low cadence, fetch-deferred: a blocking
        # dropped_counts read here would wait for the background programs
        # dispatched just above (and pay a full tunnel round trip) right on
        # the per-scan path — every 10 mapping steps, i.e. inside the p95
        # bin. Instead the counts array's device->host copy is STARTED now
        # and the value is consumed at the NEXT check (~10 mapping steps
        # later), by which point the transfer long finished; the host-side
        # np.asarray is then a cached-copy read. Warnings/errors about
        # exhausted capacity arrive one check-cadence late, which the
        # escalation path tolerates (finalize() still does a fresh read).
        if self._mapping_steps >= self._last_capacity_check + 10:
            self._last_capacity_check = self._mapping_steps
            pending = self._pending_capacity
            self._pending_capacity = self.backend_state.dropped_counts
            if hasattr(self._pending_capacity, "copy_to_host_async"):
                self._pending_capacity.copy_to_host_async()
            if pending is not None:
                self._check_capacity(np.asarray(pending))

        self.times.append(stamp)
        self.front_positions.append(front_trans)
        self.front_quats.append(self._quat(front_rot))
        return out

    # scans a queued background task may wait for a mapping-free scan
    # before being dispatched anyway (bounded staleness)
    BG_MAX_DEFER = 3

    def _dispatch_background(self, task: str, stamp: float, out: Dict, prof: bool) -> None:
        """Dispatch one queued background-cadence program (the reference's
        detached-thread bodies: loopClosureThread / priorThread /
        isam->update, backMapping.cpp:1904-1941, :2710-2712)."""
        cfg = self.cfg
        if task == "loop":
            with self.timers.stage("loop_closure", sync=(lambda: out["loop_closed"]) if prof else None):
                # externally injected pairs are tried first, one per pass
                # (performRSLoopClosure order, backMapping.cpp:2331-2336)
                if self._external_loops:
                    t_cur, t_prev = self._external_loops.pop(0)
                    self.backend_state, ext_closed = backend.external_loop_step(
                        self.backend_state,
                        jnp.asarray(t_cur - self._epoch, jnp.float32),
                        jnp.asarray(t_prev - self._epoch, jnp.float32),
                        cfg,
                    )
                    out["loop_closed_external"] = ext_closed
                self.backend_state, closed = backend.loop_closure_step(self.backend_state, cfg)
                out["loop_closed"] = closed
            self._graph_dirty = True
        elif task == "prior":
            # ground source is the external /voxel_map when provided, else
            # the self-built live map (first mapping step fills slot 0)
            gm = (
                self.ground_map
                if self.ground_map is not None
                else prior_ground.GroundMap(self.live_ground.xyz, self.live_ground.mask)
            )
            with self.timers.stage("prior", sync=(lambda: _matched) if prof else None):
                self.backend_state, _matched = self._prior_cycle_jit(
                    self.fusion_state, jnp.asarray(stamp, jnp.float32),
                    self.backend_state, gm, self.vehicle,
                )
            self._graph_dirty = True
        elif task == "solve":
            with self.timers.stage("graph_solve"):
                self.backend_state = backend.solve_graph_host(
                    self.backend_state, cfg, count_hint=self._mapping_steps + 1
                )

    def _check_capacity(self, counts: Optional[np.ndarray] = None) -> None:
        """Surface BackendState.dropped_counts on the host: warn once per
        category or raise, per StaticConfig.on_capacity. (The reference's
        containers grow without bound, backMapping.cpp:115-122; fixed
        capacities must fail loudly instead.) `counts`: a pre-fetched
        dropped_counts snapshot; None reads the live state (blocking)."""
        if counts is None:
            counts = np.asarray(self.backend_state.dropped_counts)
        for name, n in zip(_DROP_CATEGORIES, counts):
            n = int(n)
            if n <= self.drop_counts[name]:
                continue
            self.drop_counts[name] = n
            msg = (
                f"rolo_tpu: capacity exhausted for '{name}' ({n} events dropped); "
                f"raise the corresponding StaticConfig limit"
            )
            if self.cfg.static.on_capacity == "error" and name != "prior_queue_overwrites":
                raise CapacityExhausted(msg)
            if name not in self._warned_drops:
                self._warned_drops.add(name)
                import warnings

                warnings.warn(msg, RuntimeWarning)

    def finalize(self) -> None:
        """Flush deferred end-of-run work (ADVICE round-3): apply a pending
        graph solve — the async driver defers each mapping step's solve_due
        one scan, and loop closures often land near trajectory end where no
        further keyframe would trigger the solve — and run a final capacity
        check so dropped_counts are surfaced regardless of the 10-step
        check cadence. Idempotent and cheap when nothing is pending (one
        scalar fetch)."""
        # drain background tasks still queued by the per-scan scheduler
        # (loops detected near trajectory end matter most for final ATE)
        while self._bg_queue:
            self._dispatch_background(
                self._bg_queue.pop(0),
                self._last_stamp if self._last_stamp is not None else 0.0,
                {}, False,
            )
        if self._graph_dirty or bool(np.asarray(self.backend_state.pending_solve)):
            self._graph_dirty = False
            with self.timers.stage("graph_solve"):
                self.backend_state = backend.solve_graph_host(self.backend_state, self.cfg)
        self._check_capacity()

    # -- between-scan pose queries ---------------------------------------

    def fused_pose_at(self, stamp: float) -> Dict[str, np.ndarray]:
        """Wall-clock-decoupled fused pose at an ARBITRARY query time —
        the consumer API of the reference's 20 Hz fusionTimerHandler
        (/root/reference/src/lidarOdometry.cpp:137-250): dead-reckons a
        COPY of the regulator filter to `stamp` and composes
        mapping o (front_anchor^-1 o filtered_now). Callable any number
        of times between scans; never advances the filter. Returns host
        values (one device fetch)."""
        if self._epoch is None:
            raise RuntimeError("fused_pose_at before any scan was processed")
        fp = fusion.fused_pose(
            self.fusion_state, jnp.asarray(stamp - self._epoch, jnp.float32),
            self.cfg.filter,
        )
        flat = np.asarray(jnp.concatenate([
            fp.trans, fp.rot.reshape(-1), fp.velocity,
            fp.speed[None], fp.valid.astype(jnp.float32)[None],
        ]))
        return {
            "trans": flat[:3],
            "rot": flat[3:12].reshape(3, 3),
            "velocity": flat[12:15],
            "speed": float(flat[15]),
            "valid": bool(flat[16]),
        }

    def future_path(self) -> Dict[str, np.ndarray]:
        """The predictTimerHandler output
        (/root/reference/src/lidarOdometry.cpp:252-322): the ESKF rollout
        polyline at 0.2 s steps to the 8 m distance budget
        (statePropagate(0.2, 8.0), eskf.hpp:213-246), expressed in the current
        lidar frame with z zeroed, plus the final future pose the prior
        chain consumes. Returns host values (one device fetch)."""
        pred = fusion.predict_future(self.fusion_state, self.cfg.filter)
        m = pred.local_pos.shape[0]
        flat = np.asarray(jnp.concatenate([
            pred.local_pos.reshape(-1), pred.local_quat.reshape(-1),
            pred.mask.astype(jnp.float32), pred.final_pos, pred.final_quat,
            pred.local_velocity, pred.heading_rate[None],
            pred.valid.astype(jnp.float32)[None],
        ]))
        o = 0
        pos = flat[o:o + 3 * m].reshape(m, 3); o += 3 * m
        quat = flat[o:o + 4 * m].reshape(m, 4); o += 4 * m
        mask = flat[o:o + m] > 0.5; o += m
        return {
            "path_pos": pos[mask],
            "path_quat_wxyz": quat[mask],
            "final_pos": flat[o:o + 3],
            "final_quat_wxyz": flat[o + 3:o + 7],
            "local_velocity": flat[o + 7:o + 10],
            "heading_rate": float(flat[o + 10]),
            "valid": bool(flat[o + 11]),
        }

    def keyframe_marginal_covariance(self, indices) -> np.ndarray:
        """[M, 6, 6] marginal covariance blocks (rotvec, translation) of
        the requested keyframes under the current pose graph — the
        isam->marginalCovariance analog (backMapping.cpp:1161). One
        device program + one fetch; linearizes at the current keyframe
        poses."""
        from ..graph import marginal_covariance

        st = self.backend_state
        return np.asarray(marginal_covariance(
            st.graph, st.db.rot, st.db.trans, st.db.count,
            jnp.asarray(indices, jnp.int32),
        ))

    # -- egress ----------------------------------------------------------

    @staticmethod
    def _np_stack(arrs, width) -> np.ndarray:
        """One-transfer stack of a device-array list (empty-safe)."""
        if not arrs:
            return np.zeros((0, width), np.float32)
        return np.asarray(jnp.stack(arrs))

    def front_positions_np(self) -> np.ndarray:
        return self._np_stack(self.front_positions, 3)

    def front_quats_np(self) -> np.ndarray:
        return self._np_stack(self.front_quats, 4)

    def mapped_positions_np(self) -> np.ndarray:
        return self._np_stack(self.mapped_positions, 3)

    def mapped_quats_np(self) -> np.ndarray:
        return self._np_stack(self.mapped_quats, 4)

    def fused_trajectory_np(self):
        """(times, positions, quats) of the VALID fused pose samples (the
        20 Hz fused odometry stream, lidarOdometry.cpp:193-249)."""
        if not self.fused_positions:
            return np.zeros((0,)), np.zeros((0, 3), np.float32), np.zeros((0, 4), np.float32)
        valid = np.asarray(jnp.stack(self.fused_valid))
        pos = self._np_stack(self.fused_positions, 3)
        quat = self._np_stack(self.fused_quats, 4)
        times = np.asarray(self.times)
        return times[valid], pos[valid], quat[valid]

    def keyframe_trajectory(self):
        """(times, positions, quats_wxyz) of the optimized keyframe poses.
        Applies any pending loop/prior graph correction first (finalize)."""
        self.finalize()
        db = self.backend_state.db
        k = int(db.count)
        rots = np.asarray(db.rot[:k])
        quats = (
            np.asarray(jax.vmap(so3.matrix_to_quat)(jnp.asarray(rots))) if k else np.zeros((0, 4))
        )
        return np.asarray(db.time[:k]), np.asarray(db.trans[:k]), quats

    def save_results(self, out_dir: str) -> None:
        """End-of-run export: TUM trajectories + g2o graph + keyframe map
        PCD (saveTUM/saveGlobalPCDs, backMapping.cpp:1500-1608, 2679-2699)."""
        import os

        self.finalize()
        os.makedirs(out_dir, exist_ok=True)
        rio.write_tum(
            os.path.join(out_dir, "front_end_tum.txt"),
            self.times, self.front_positions_np(), self.front_quats_np(),
        )
        kt, kp, kq = self.keyframe_trajectory()
        rio.write_tum(os.path.join(out_dir, "optimized_tum.txt"), kt, kp, kq)
        ft, fpos, fq = self.fused_trajectory_np()
        if len(ft):
            rio.write_tum(os.path.join(out_dir, "fused_tum.txt"), ft, fpos, fq)

        # g2o: odometry chain + loop + prior edges
        st = self.backend_state
        k = int(st.db.count)
        odom_edges = []
        for i in range(1, k):
            rel_r = np.asarray(st.graph.odom_rel_rot[i])
            rel_t = np.asarray(st.graph.odom_rel_trans[i])
            odom_edges.append((i - 1, i, rel_t, np.asarray(so3.matrix_to_quat(jnp.asarray(rel_r)))))

        def edges_of(f):
            out = []
            for n in range(int(f.count)):
                out.append((
                    int(f.i[n]), int(f.j[n]), np.asarray(f.rel_trans[n]),
                    np.asarray(so3.matrix_to_quat(jnp.asarray(f.rel_rot[n]))),
                ))
            return out

        rio.write_g2o(
            os.path.join(out_dir, "pose_graph.g2o"), kp, kq,
            odom_edges, edges_of(st.graph.loops), edges_of(st.graph.priors),
        )

        # merged keyframe feature map
        clouds = []
        for i in range(k):
            rot = np.asarray(st.db.rot[i])
            trans = np.asarray(st.db.trans[i])
            for xyz, mask in ((st.db.corner_xyz[i], st.db.corner_mask[i]),
                              (st.db.surf_xyz[i], st.db.surf_mask[i])):
                pts = np.asarray(xyz)[np.asarray(mask)]
                clouds.append(pts @ rot.T + trans)
        if clouds:
            rio.write_pcd(os.path.join(out_dir, "global_map.pcd"), np.concatenate(clouds))

    def checkpoint(self, path: str) -> None:
        """Serialize the full SLAM state (backend + frontend + fusion) plus
        the host-side driver clocks. Without the clocks a restore would
        re-rebase stamps to a fresh epoch while the device-side keyframe
        times keep the old one — breaking the recency window and the prior
        10 ms keyframe-sync gate (the crash/recovery analog of the
        reference's respawn="true", launch/module_loam.launch:6-9)."""
        self.finalize()  # pending corrections must survive the crash
        host = np.asarray([
            self._epoch if self._epoch is not None else np.nan,
            self._last_stamp if self._last_stamp is not None else np.nan,
            self._last_mapping_time, self._last_loop_time, self._last_prior_time,
            float(self._mapping_steps), self._next_solve_check,
        ], np.float64)
        rio.save_checkpoint(
            path,
            (self.odom_state, self.fusion_state, self.backend_state, self.live_ground),
            host_meta=host,
        )

    def restore(self, path: str) -> None:
        (
            (self.odom_state, self.fusion_state, self.backend_state, self.live_ground),
            host,
        ) = rio.load_checkpoint(
            path,
            (self.odom_state, self.fusion_state, self.backend_state, self.live_ground),
            with_host_meta=True,
        )
        if host is not None:
            self._epoch = None if np.isnan(host[0]) else float(host[0])
            self._last_stamp = None if np.isnan(host[1]) else float(host[1])
            self._last_mapping_time = float(host[2])
            self._last_loop_time = float(host[3])
            self._last_prior_time = float(host[4])
            self._mapping_steps = int(host[5])
            self._next_solve_check = float(host[6])
