from .models import (
    ScaramuzzaCamera,
    PinholeCamera,
    KannalaBrandtCamera,
    MeiCamera,
    camera_from_yaml,
    camera_from_dict,
)
