#!/usr/bin/env python
"""Robot data-collection entry point — capability parity with
data_collect_experiment/main_for_data_collect.py:260-336.

Drives N pick-place episodes (simulated by default; `--transport ros` wires
the same collector to live rospy topics on a robot host) through the
DataCollector -> EpisodeRecorder capture tree, then optionally runs the
time-sync ETL so one command goes from robot to data_sum shards:

    python data_collect.py --out_dir /tmp/collect --episodes 5 --build
"""

import argparse


def main():
    from icra2021_multimodal_ad_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # amortize the tunnel's 20-120 s first compiles
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_lidar", type=int, default=963)
    p.add_argument("--no_drop", action="store_true",
                   help="collect normal (no-drop) episodes")
    p.add_argument("--object_grams", type=float, default=210.0)
    p.add_argument("--build", action="store_true",
                   help="run the ETL afterwards (capture tree -> data_sum)")
    p.add_argument("--episodes_per_shard", type=int, default=120)
    p.add_argument("--transport", choices=["sim", "ros"], default="sim")
    p.add_argument("--episode_s", type=float, default=10.0,
                   help="wall-clock seconds to record per episode "
                        "(ros transport)")
    p.add_argument("--motion", action="store_true",
                   help="drive the robot through the scripted pick-place "
                        "routine while recording (ros transport; "
                        "main_for_data_collect.py:260-336 loop)")
    args = p.parse_args()

    from icra2021_multimodal_ad_tpu.data.orchestration import (
        PickPlaceScript,
        collect_and_build,
        run_collection,
    )

    if args.transport == "ros":
        # live robot: subscribe a fresh collector to the HSR topics per
        # episode, record for --episode_s wall-clock seconds, persist the
        # capture tree, detach (rospy callbacks keep arriving on their own
        # threads while this loop sleeps; rospy.spin is not needed and
        # would never return between episodes)
        import os
        import time as _time

        from icra2021_multimodal_ad_tpu.data.acquisition import (
            DataCollector,
            make_ros_transport,
        )
        from icra2021_multimodal_ad_tpu.data.orchestration import (
            next_episode_index,
        )

        transport, _spin = make_ros_transport()
        import rospy

        motion_backend = None
        if args.motion:
            from icra2021_multimodal_ad_tpu.data.hsr_motion import (
                RosMotionBackend,
            )

            motion_backend = RosMotionBackend()

        start = next_episode_index(os.path.join(args.out_dir, "data"))
        for ep in range(start, start + args.episodes):
            name = f"ep{ep:04d}"
            # episode clock must be the ROS clock: row times come from
            # message header stamps (sim time under /use_sim_time)
            collector = DataCollector(
                transport, os.path.join(args.out_dir, "data"), name,
                start_time=rospy.get_time(),
            )
            if motion_backend is not None:
                from icra2021_multimodal_ad_tpu.data.hsr_motion import (
                    run_robot_episode,
                )

                print(f"recording {name} (scripted pick-place) ...")
                run_robot_episode(motion_backend, carry_s=args.episode_s)
            else:
                print(f"recording {name} for {args.episode_s:.1f} s ...")
                _time.sleep(args.episode_s)
            collector.detach()
            path = collector.recorder.save()
            print(f"saved {path}")
        if args.build:
            from icra2021_multimodal_ad_tpu.data.etl import hsr_preprocess

            shards = hsr_preprocess(
                os.path.join(args.out_dir, "data"), args.out_dir,
                episodes_per_shard=args.episodes_per_shard,
                n_lidar=args.n_lidar,
            )
            print("data_sum shards:", shards)
        return

    script = PickPlaceScript(drop=not args.no_drop,
                             object_grams=args.object_grams)
    if args.build:
        shards = collect_and_build(
            args.out_dir, args.episodes, script=script, seed=args.seed,
            n_lidar=args.n_lidar, episodes_per_shard=args.episodes_per_shard,
            verbose=True,
        )
        print("data_sum shards:", shards)
    else:
        names = run_collection(args.out_dir, args.episodes, script=script,
                               seed=args.seed, n_lidar=args.n_lidar,
                               verbose=True)
        print("episodes:", names)


if __name__ == "__main__":
    main()
