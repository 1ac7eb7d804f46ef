from .dgn import (DGNLayerComplex, DGNLayerSimple, DGNLayerTower, DGNTower,
                  VirtualNode, make_dgn_layer)
