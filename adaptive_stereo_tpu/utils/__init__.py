"""Host-side utilities: replay buffers, visualization, metrics logging."""

from .stereo_reservoir import StereoReservoir
from .stereo_priority_queue import StereoPriorityQueue
