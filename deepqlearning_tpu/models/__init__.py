from .chain import Activation, Chain, Dense, Flatten, LSTM, isrecurrent
from .dueling import DuelingNetwork, create_dueling_network
