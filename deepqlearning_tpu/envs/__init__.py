from .base import Env, auto_reset
from .test_mdp import TestMDP
from .gridworld import SimpleGridWorld
from .tiger import TigerPOMDP
from .cartpole import CartPole
from .adapters import MDPEnv, POMDPEnv
from .compat import HostEnv
