"""EAO object subsystem: 2D frame objects, 3D object landmarks, ensemble
data association, isolation-forest culling, merge/overlap resolution."""
