"""CF standard-name table: vendored snapshot + optional live refresh.

The reference validates ``standard_name`` attributes against the published
CF conventions table, fetched over HTTP at import time and disabled when
the network is unavailable (``data_api/geozarr/common.py:107-167``).  This
engine must behave deterministically on air-gapped clusters, so the design
is inverted: a vendored snapshot of the table ships in-process (below) and
``fetch_cf_standard_names`` exists for an explicit, caller-driven refresh
from the same public URL the reference uses.  Validation therefore never
silently turns itself off — the failure mode the reference has when GitHub
is unreachable.

The snapshot is a curated transcription of the public CF standard name
table (https://cfconventions.org/standard-names.html), covering the
coordinate, EO/radiance, atmosphere, ocean, cryosphere, land-surface and
flag vocabularies that Sentinel-class products use.  It intentionally
errs toward names verifiable in the published table; the validation rule
only REJECTS names absent from the set, so extending the snapshot is
always safe.
"""

from __future__ import annotations

# Public URL of the authoritative XML (same constant the reference embeds).
CF_STANDARD_NAME_URL = (
    "https://raw.githubusercontent.com/cf-convention/cf-convention.github.io/"
    "master/Data/cf-standard-names/current/src/cf-standard-name-table.xml"
)


def fetch_cf_standard_names(url: str = CF_STANDARD_NAME_URL) -> tuple[str, ...]:
    """Fetch and parse the live CF table (explicit refresh; raises offline).

    Parses ``<entry id="...">`` elements from the XML — the table's stable
    public format — without requiring an XML-schema dependency.
    """
    import re
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": "data-model-spark"})
    with urllib.request.urlopen(req) as response:  # noqa: S310 (explicit opt-in)
        content = response.read().decode("utf-8", errors="replace")
    names = re.findall(r'<entry id="([^"]+)">', content)
    if not names:
        raise ValueError(f"no CF entries parsed from {url}")
    return tuple(dict.fromkeys(names))


CF_STANDARD_NAMES: tuple[str, ...] = (
    # -- horizontal / vertical / time coordinates --
    "latitude",
    "longitude",
    "grid_latitude",
    "grid_longitude",
    "projection_x_coordinate",
    "projection_y_coordinate",
    "projection_x_angular_coordinate",
    "projection_y_angular_coordinate",
    "altitude",
    "height",
    "depth",
    "air_pressure",
    "model_level_number",
    "atmosphere_sigma_coordinate",
    "atmosphere_hybrid_sigma_pressure_coordinate",
    "atmosphere_hybrid_height_coordinate",
    "atmosphere_ln_pressure_coordinate",
    "atmosphere_sleve_coordinate",
    "ocean_sigma_coordinate",
    "ocean_s_coordinate",
    "ocean_s_coordinate_g1",
    "ocean_s_coordinate_g2",
    "ocean_sigma_z_coordinate",
    "ocean_double_sigma_coordinate",
    "height_above_geopotential_datum",
    "height_above_reference_ellipsoid",
    "height_above_mean_sea_level",
    "geopotential_height",
    "time",
    "forecast_reference_time",
    "forecast_period",
    "realization",
    "region",
    "area_type",
    # -- viewing / platform geometry --
    "sensor_zenith_angle",
    "sensor_azimuth_angle",
    "solar_zenith_angle",
    "solar_azimuth_angle",
    "platform_azimuth_angle",
    "platform_course",
    "platform_orientation",
    "platform_pitch",
    "platform_roll",
    "platform_yaw",
    "platform_speed_wrt_ground",
    "platform_id",
    "platform_name",
    "angle_of_incidence",
    "angle_of_rotation_from_east_to_x",
    "scattering_angle",
    "zenith_angle",
    "sensor_band_central_radiation_wavelength",
    "radiation_wavelength",
    "radiation_frequency",
    # -- radiance / reflectance / radiative fluxes --
    "toa_bidirectional_reflectance",
    "surface_bidirectional_reflectance",
    "toa_outgoing_radiance_per_unit_wavelength",
    "toa_outgoing_radiance_per_unit_wavenumber",
    "surface_upwelling_radiance_per_unit_wavelength",
    "surface_downwelling_radiance_per_unit_wavelength",
    "upwelling_radiance_per_unit_wavelength_in_air",
    "downwelling_radiance_per_unit_wavelength_in_air",
    "isotropic_shortwave_radiance_in_air",
    "isotropic_longwave_radiance_in_air",
    "surface_downwelling_shortwave_flux_in_air",
    "surface_downwelling_longwave_flux_in_air",
    "surface_upwelling_shortwave_flux_in_air",
    "surface_upwelling_longwave_flux_in_air",
    "surface_net_downward_shortwave_flux",
    "surface_net_downward_longwave_flux",
    "surface_net_downward_radiative_flux",
    "downwelling_shortwave_flux_in_air",
    "upwelling_shortwave_flux_in_air",
    "downwelling_longwave_flux_in_air",
    "upwelling_longwave_flux_in_air",
    "net_downward_shortwave_flux_in_air",
    "toa_incoming_shortwave_flux",
    "toa_outgoing_shortwave_flux",
    "toa_outgoing_longwave_flux",
    "toa_net_downward_shortwave_flux",
    "surface_albedo",
    "surface_downwelling_photosynthetic_photon_flux_in_air",
    # -- atmosphere: state --
    "air_temperature",
    "air_potential_temperature",
    "equivalent_potential_temperature",
    "virtual_temperature",
    "dew_point_temperature",
    "wet_bulb_temperature",
    "surface_temperature",
    "surface_air_pressure",
    "air_pressure_at_mean_sea_level",
    "air_density",
    "relative_humidity",
    "specific_humidity",
    "humidity_mixing_ratio",
    "atmosphere_mass_content_of_water_vapor",
    "water_vapor_partial_pressure_in_air",
    "tropopause_air_pressure",
    "tropopause_air_temperature",
    "tropopause_altitude",
    # -- atmosphere: dynamics --
    "wind_speed",
    "wind_speed_of_gust",
    "wind_from_direction",
    "eastward_wind",
    "northward_wind",
    "upward_air_velocity",
    "lagrangian_tendency_of_air_pressure",
    "divergence_of_wind",
    "atmosphere_relative_vorticity",
    "geostrophic_eastward_wind",
    "geostrophic_northward_wind",
    # -- clouds / precipitation --
    "cloud_area_fraction",
    "cloud_area_fraction_in_atmosphere_layer",
    "convective_cloud_area_fraction",
    "low_type_cloud_area_fraction",
    "medium_type_cloud_area_fraction",
    "high_type_cloud_area_fraction",
    "cloud_top_altitude",
    "cloud_base_altitude",
    "air_pressure_at_cloud_top",
    "air_pressure_at_cloud_base",
    "air_temperature_at_cloud_top",
    "atmosphere_mass_content_of_cloud_liquid_water",
    "atmosphere_mass_content_of_cloud_ice",
    "mass_fraction_of_cloud_liquid_water_in_air",
    "mass_fraction_of_cloud_ice_in_air",
    "atmosphere_optical_thickness_due_to_cloud",
    "effective_radius_of_cloud_liquid_water_particles",
    "precipitation_amount",
    "precipitation_flux",
    "rainfall_amount",
    "rainfall_flux",
    "rainfall_rate",
    "snowfall_amount",
    "snowfall_flux",
    "lwe_precipitation_rate",
    "lwe_thickness_of_precipitation_amount",
    "lwe_thickness_of_snowfall_amount",
    "thickness_of_rainfall_amount",
    "convective_precipitation_flux",
    "stratiform_precipitation_flux",
    # -- atmospheric composition / aerosol --
    "mole_fraction_of_ozone_in_air",
    "mass_fraction_of_ozone_in_air",
    "mole_fraction_of_carbon_dioxide_in_air",
    "mole_fraction_of_methane_in_air",
    "mole_fraction_of_nitrogen_dioxide_in_air",
    "mole_fraction_of_nitrogen_monoxide_in_air",
    "mole_fraction_of_carbon_monoxide_in_air",
    "mole_fraction_of_sulfur_dioxide_in_air",
    "mole_fraction_of_formaldehyde_in_air",
    "atmosphere_mass_content_of_ozone",
    "equivalent_thickness_at_stp_of_atmosphere_ozone_content",
    "atmosphere_mass_content_of_sulfur_dioxide",
    "atmosphere_optical_thickness_due_to_ambient_aerosol_particles",
    "atmosphere_absorption_optical_thickness_due_to_ambient_aerosol_particles",
    "angstrom_exponent_of_ambient_aerosol_in_air",
    "mass_concentration_of_pm10_ambient_aerosol_particles_in_air",
    "mass_concentration_of_pm2p5_ambient_aerosol_particles_in_air",
    # -- ocean --
    "sea_surface_temperature",
    "sea_surface_skin_temperature",
    "sea_surface_subskin_temperature",
    "sea_surface_foundation_temperature",
    "sea_water_temperature",
    "sea_water_potential_temperature",
    "sea_water_conservative_temperature",
    "sea_water_salinity",
    "sea_water_practical_salinity",
    "sea_water_absolute_salinity",
    "sea_water_density",
    "sea_water_pressure",
    "sea_water_electrical_conductivity",
    "sea_water_ph_reported_on_total_scale",
    "sea_surface_height_above_geoid",
    "sea_surface_height_above_mean_sea_level",
    "sea_surface_height_above_reference_ellipsoid",
    "sea_floor_depth_below_sea_surface",
    "sea_floor_depth_below_geoid",
    "eastward_sea_water_velocity",
    "northward_sea_water_velocity",
    "upward_sea_water_velocity",
    "sea_water_speed",
    "direction_of_sea_water_velocity",
    "ocean_mixed_layer_thickness",
    "sea_surface_wave_significant_height",
    "sea_surface_wind_wave_significant_height",
    "sea_surface_swell_wave_significant_height",
    "sea_surface_wave_from_direction",
    "sea_surface_wind_wave_period",
    "sea_surface_swell_wave_period",
    "sea_surface_wave_period_at_variance_spectral_density_maximum",
    "mass_concentration_of_chlorophyll_a_in_sea_water",
    "mass_concentration_of_suspended_matter_in_sea_water",
    "sea_water_turbidity",
    "mole_concentration_of_dissolved_molecular_oxygen_in_sea_water",
    "mole_concentration_of_nitrate_in_sea_water",
    "mole_concentration_of_phosphate_in_sea_water",
    "mole_concentration_of_silicate_in_sea_water",
    # -- cryosphere --
    "sea_ice_area_fraction",
    "sea_ice_thickness",
    "sea_ice_temperature",
    "sea_ice_salinity",
    "eastward_sea_ice_velocity",
    "northward_sea_ice_velocity",
    "sea_ice_speed",
    "age_of_sea_ice",
    "surface_snow_thickness",
    "surface_snow_area_fraction",
    "surface_snow_amount",
    "surface_snow_density",
    "lwe_thickness_of_surface_snow_amount",
    "temperature_in_surface_snow",
    "land_ice_area_fraction",
    "land_ice_thickness",
    # -- land surface / hydrology / vegetation --
    "land_area_fraction",
    "land_binary_mask",
    "surface_roughness_length",
    "surface_roughness_length_for_momentum_in_air",
    "soil_temperature",
    "mass_content_of_water_in_soil",
    "mass_content_of_water_in_soil_layer",
    "volume_fraction_of_condensed_water_in_soil",
    "soil_porosity",
    "leaf_area_index",
    "normalized_difference_vegetation_index",
    "vegetation_area_fraction",
    "canopy_height",
    "canopy_temperature",
    "root_depth",
    "surface_runoff_flux",
    "runoff_flux",
    "runoff_amount",
    "subsurface_runoff_flux",
    "water_evaporation_flux",
    "water_evapotranspiration_flux",
    "surface_upward_latent_heat_flux",
    "surface_upward_sensible_heat_flux",
    "downward_heat_flux_in_soil",
    # -- active sensing --
    "surface_backwards_scattering_coefficient_of_radar_wave",
    "equivalent_reflectivity_factor",
    # -- flags / bookkeeping --
    "quality_flag",
    "status_flag",
    "number_of_observations",
    # -- r5 snapshot extension: second transcription pass over the
    # published table (anomalies, squares, tendencies, clear-sky fluxes,
    # stresses, carbon cycle, waves/tides, density variants) --
    "air_temperature_anomaly",
    "air_pressure_anomaly",
    "surface_temperature_anomaly",
    "square_of_air_temperature",
    "square_of_eastward_wind",
    "square_of_northward_wind",
    "square_of_sea_surface_temperature",
    "atmosphere_boundary_layer_thickness",
    "geopotential",
    "surface_geopotential",
    "visibility_in_air",
    "freezing_level_altitude",
    "atmosphere_absolute_vorticity",
    "ertel_potential_vorticity",
    "tendency_of_air_temperature",
    "tendency_of_air_pressure",
    "tendency_of_specific_humidity",
    "tendency_of_eastward_wind",
    "tendency_of_northward_wind",
    "mass_fraction_of_water_in_air",
    "mole_fraction_of_water_vapor_in_air",
    "cloud_liquid_water_mixing_ratio",
    "cloud_ice_mixing_ratio",
    "atmosphere_mass_content_of_water",
    "canopy_water_amount",
    "lwe_thickness_of_canopy_water_amount",
    "surface_snow_melt_amount",
    "lwe_snowfall_rate",
    "surface_downwelling_shortwave_flux_in_air_assuming_clear_sky",
    "surface_downwelling_longwave_flux_in_air_assuming_clear_sky",
    "surface_upwelling_shortwave_flux_in_air_assuming_clear_sky",
    "toa_outgoing_shortwave_flux_assuming_clear_sky",
    "toa_outgoing_longwave_flux_assuming_clear_sky",
    "surface_diffuse_downwelling_shortwave_flux_in_air",
    "surface_direct_downwelling_shortwave_flux_in_air",
    "downwelling_photosynthetic_photon_flux_in_air",
    "brightness_temperature",
    "toa_brightness_temperature",
    "surface_downward_eastward_stress",
    "surface_downward_northward_stress",
    "downward_eastward_momentum_flux_in_air",
    "upward_heat_flux_in_air",
    "surface_downward_heat_flux_in_sea_water",
    "sea_water_sigma_t",
    "sea_water_sigma_theta",
    "sea_water_potential_density",
    "barotropic_eastward_sea_water_velocity",
    "barotropic_northward_sea_water_velocity",
    "baroclinic_eastward_sea_water_velocity",
    "baroclinic_northward_sea_water_velocity",
    "ocean_barotropic_streamfunction",
    "sea_surface_salinity",
    "sea_water_velocity_to_direction",
    "northward_ocean_heat_transport",
    "ocean_volume",
    "cell_area",
    "cell_thickness",
    "sea_water_alkalinity_expressed_as_mole_equivalent",
    "mole_concentration_of_dissolved_inorganic_carbon_in_sea_water",
    "surface_partial_pressure_of_carbon_dioxide_in_sea_water",
    "sea_surface_wave_zero_upcrossing_period",
    "sea_surface_wave_maximum_height",
    "sea_surface_height_amplitude_due_to_geocentric_ocean_tide",
    "sea_surface_height_above_geopotential_datum",
    "depth_below_geoid",
    "sea_ice_freeboard",
    "tendency_of_sea_ice_area_fraction_due_to_dynamics",
    "water_potential_evaporation_flux",
    "water_potential_evaporation_amount",
    "volume_fraction_of_condensed_water_in_soil_at_field_capacity",
    "volume_fraction_of_condensed_water_in_soil_at_wilting_point",
    "soil_hydraulic_conductivity_at_saturation",
    "gross_primary_productivity_of_biomass_expressed_as_carbon",
    "net_primary_productivity_of_biomass_expressed_as_carbon",
    "surface_upward_mole_flux_of_carbon_dioxide",
    "surface_downward_mole_flux_of_carbon_dioxide",
    "burned_area",
    "mole_fraction_of_nitrous_oxide_in_air",
    "mass_concentration_of_ozone_in_air",
    "mass_concentration_of_pm1_ambient_aerosol_particles_in_air",
)


def parse_cf_table_file(path: str) -> tuple[str, ...]:
    """Parse a LOCAL copy of the full CF table (the air-gapped completeness
    path: download ``cf-standard-name-table.xml`` once, ship it with the
    job).  Accepts the published XML (``<entry id="...">``) or a plain
    newline-separated name list."""
    import re

    with open(path, encoding="utf-8") as f:
        content = f.read()
    names = re.findall(r'<entry id="([^"]+)">', content)
    if not names:  # plain-text fallback: one name per line
        names = [ln.strip() for ln in content.splitlines()
                 if ln.strip() and not ln.lstrip().startswith("#")]
    if not names:
        raise ValueError(f"no CF entries parsed from {path}")
    return tuple(dict.fromkeys(names))


def effective_cf_names() -> tuple[str, ...]:
    """Snapshot ∪ optional full local table (env ``DMS_CF_TABLE_PATH``).

    The union — never a replacement — so a stale local file can only ADD
    valid names, matching the snapshot's reject-only-unknown contract.
    """
    import os

    extra = os.environ.get("DMS_CF_TABLE_PATH")
    if not extra:
        return CF_STANDARD_NAMES
    return tuple(dict.fromkeys(CF_STANDARD_NAMES + parse_cf_table_file(extra)))
