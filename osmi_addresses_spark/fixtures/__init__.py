from .generator import (  # noqa: F401
    World,
    generate_world,
    world_to_documents,
    write_fixture,
    fixture_dir,
)
