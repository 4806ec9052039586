from qaray_tpu.photon.gather import PhotonMapData, estimate_irradiance
from qaray_tpu.photon.build import build_photon_maps
