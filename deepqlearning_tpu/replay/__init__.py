from .transition import DQExperience, TransitionBatch
from .prioritized import PrioritizedReplayBuffer, ReplayBuffer, ReplayState
from .episode import EpisodeBatch, EpisodeReplayBuffer, EpisodeReplayState
