from real_robot_nerf_actor_tpu.data.ply import read_ply, write_ply
from real_robot_nerf_actor_tpu.data.keyframes import (
    parse_xarm_position_file, extract_keyframes, KeyframeDemo)
from real_robot_nerf_actor_tpu.data.replay import (
    ReplaySource, RobotIO, ReplayRobotIO, PointCloudSample)
from real_robot_nerf_actor_tpu.data.synthetic import (
    make_synthetic_scene, make_synthetic_demo, SyntheticScene)
