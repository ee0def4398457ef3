from .chain import Activation, Chain, Conv2D, Dense, Flatten, GRU, LSTM, isrecurrent
from .dueling import DuelingNetwork, create_dueling_network
