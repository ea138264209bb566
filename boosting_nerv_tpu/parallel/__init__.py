from .mesh import MeshPlan, make_mesh_plan
