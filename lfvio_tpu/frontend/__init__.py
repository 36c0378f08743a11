from .pyramid import gaussian_pyramid
from .klt import pyramidal_lk
from .detect import shi_tomasi_response, select_features, annulus_mask
from .clahe import clahe
from .ransac import spherical_ransac_e
