from . import fffb, kwta, neigh_inhib
