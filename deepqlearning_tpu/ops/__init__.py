from . import sumtree
from .helpers import batch_trajectories, flattenbatch, globalnorm, huber_loss
