"""Robot-side motion control for collection episodes.

Capability parity with the reference's robot-drive layer
(data_collect_experiment/main_for_data_collect.py):

  * `JointController` (main_for_data_collect.py:149-212): named joint poses
    through the HSR's SafeJointChange service + gripper trajectory
    commands -> `RosMotionBackend` (same poses, same service/topic names).
  * the `__main__` pick-place routine (main_for_data_collect.py:260-336):
    initial pose -> grasp -> head down -> carry pose -> place -> release
    -> `run_robot_episode`, non-interactive by default (the reference's
    raw_input gates become an optional `confirm` callback).
  * `GripperDegreeController` (main_for_data_collect.py:214-241): gripper
    joint radians recorded per message -> the recorder's `on_gripper`
    stream, persisted as `gripper_degree.csv` in the capture tree.

The motion backend is a small protocol so the routine is testable without
a robot: `SimMotionBackend` records the call sequence; `RosMotionBackend`
talks to the real HSR.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

#: named pose -> (joint names, positions), exactly the reference's table
#: (main_for_data_collect.py:170-190)
NAMED_POSES = {
    "initial_position": (
        ["arm_flex_joint", "arm_roll_joint", "wrist_flex_joint"],
        [-2.4, 0.0, 0.7],
    ),
    "head_down_position": (
        ["head_pan_joint", "head_tilt_joint"],
        [0.0, -0.6],
    ),
    "go_to_position": (
        ["arm_flex_joint", "wrist_flex_joint"],
        [0.0, -1.57],
    ),
    "place_position": (
        ["arm_flex_joint", "wrist_flex_joint"],
        [-1.2, -0.4],
    ),
}

#: reference gripper-state joints captured per message
#: (main_for_data_collect.py:231-236)
GRIPPER_JOINTS = (
    "hand_l_proximal_joint", "hand_l_spring_proximal_joint",
    "hand_l_distal_joint", "hand_l_mimic_distal_joint",
    "hand_r_proximal_joint", "hand_r_spring_proximal_joint",
    "hand_r_distal_joint", "hand_r_mimic_distal_joint",
)


class SimMotionBackend:
    """Records the motion-command sequence (tests / dry runs)."""

    def __init__(self, clock: Callable[[], float] = time.monotonic):
        self.calls: List[Tuple] = []
        self._clock = clock

    def move_to_joint_positions(self, pose: str) -> bool:
        if pose not in NAMED_POSES:
            pose = "place_position"  # reference's else-branch default
        self.calls.append(("move", pose))
        return True

    def grasp(self, position: float) -> None:
        self.calls.append(("grasp", position))

    def apply_force(self, force: float) -> None:
        self.calls.append(("apply_force", force))

    def sleep(self, seconds: float) -> None:
        self.calls.append(("sleep", seconds))


class RosMotionBackend:  # pragma: no cover — requires a live HSR
    """The reference's JointController on the real robot
    (main_for_data_collect.py:149-212): SafeJointChange service for named
    poses, `/hsrb/gripper_controller/command` trajectory for the gripper,
    hsrb_interface's gripper.apply_force for the pick."""

    JOINT_SERVICE = "/safe_pose_changer/change_joint"
    GRIPPER_TOPIC = "/hsrb/gripper_controller/command"
    CONNECTION_TIMEOUT = 10.0  # main_for_data_collect.py:18

    def __init__(self):
        import rospy
        import trajectory_msgs.msg
        from sensor_msgs.msg import JointState
        from tmc_msgs.srv import SafeJointChange, SafeJointChangeRequest

        if not rospy.core.is_initialized():
            rospy.init_node("icra_tpu_motion", anonymous=True)
        self._rospy = rospy
        self._traj_msgs = trajectory_msgs.msg
        self._JointState = JointState
        self._SafeJointChangeRequest = SafeJointChangeRequest
        self._client = rospy.ServiceProxy(self.JOINT_SERVICE, SafeJointChange)
        self._gripper_pub = rospy.Publisher(
            self.GRIPPER_TOPIC, trajectory_msgs.msg.JointTrajectory,
            queue_size=10,
        )
        self._client.wait_for_service(timeout=self.CONNECTION_TIMEOUT)
        self._hsrb_gripper = None
        try:  # hsrb_interface when present (gripper.apply_force pick)
            from hsrb_interface import Robot

            self._hsrb_gripper = Robot().try_get("gripper")
        except Exception:  # noqa: BLE001 — service-level control still works
            pass

    def move_to_joint_positions(self, pose: str) -> bool:
        names, positions = NAMED_POSES.get(pose, NAMED_POSES["place_position"])
        goal = self._JointState()
        goal.name.extend(names)
        goal.position.extend(positions)
        try:
            res = self._client(self._SafeJointChangeRequest(goal))
        except Exception as e:  # noqa: BLE001 — reference logs and returns
            self._rospy.logerr(e)
            return False
        return res.success

    def grasp(self, position: float) -> None:
        traj = self._traj_msgs.JointTrajectory()
        traj.joint_names = ["hand_motor_joint"]
        p = self._traj_msgs.JointTrajectoryPoint()
        p.positions = [position]
        p.velocities = [0]
        p.effort = [0.1]
        p.time_from_start = self._rospy.Time(3)
        traj.points = [p]
        self._gripper_pub.publish(traj)

    def apply_force(self, force: float) -> None:
        if self._hsrb_gripper is not None:
            self._hsrb_gripper.apply_force(force)
        else:
            self.grasp(-0.1)  # close via trajectory when hsrb_interface absent

    def sleep(self, seconds: float) -> None:
        self._rospy.sleep(seconds)


def run_robot_episode(backend,
                      confirm: Optional[Callable[[str], bool]] = None,
                      carry_s: float = 5.0) -> bool:
    """One pick-place collection episode on a (real or simulated) robot —
    the reference's `__main__` routine (main_for_data_collect.py:273-336)
    as a function.  Sensor recording runs concurrently (the caller attaches
    a DataCollector to the sensor transport); this drives only the motion.

    `confirm(step)` replaces the reference's raw_input gates: return False
    to abort (the 'q' path).  None -> fully autonomous.
    Returns True when the episode completed."""
    gate = confirm if confirm is not None else (lambda step: True)

    backend.move_to_joint_positions("initial_position")  # 1. initial pose
    backend.grasp(1.0)                                   # open
    if not gate("pick"):                                 # 2. pick
        return False
    backend.apply_force(1.0)                             # close on object
    backend.move_to_joint_positions("head_down_position")  # 3. go-to pose
    backend.move_to_joint_positions("go_to_position")
    if not gate("carry"):                                # 4. carry to box
        return False
    backend.sleep(carry_s)  # the carry window — where slips/drops happen
    backend.move_to_joint_positions("place_position")    # 5. place
    backend.sleep(2.0)  # (the reference saves its CSVs in this dwell;
    backend.sleep(1.0)  # here persistence is the caller's episode boundary)
    backend.grasp(1.0)                                   # release
    backend.move_to_joint_positions("go_to_position")    # 6. retreat
    return True


def gripper_radians_from_joint_state(names, positions) -> List[float]:
    """Extract the reference's gripper joints from a JointState message
    (main_for_data_collect.py:229-236 filter), in message order."""
    return [p for n, p in zip(names, positions) if n in GRIPPER_JOINTS]
