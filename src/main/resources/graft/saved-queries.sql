-- Saved analytic queries in the reference's file format (label/description
-- headers parsed by the registry; ${...} placeholders substituted with
-- catalog table names — reference sql/saved-queries.sql + stack.ts:450-506).

-- label: total_buildings
-- description: Total distinct buildings after metadata-data join
SELECT COUNT(DISTINCT m.bldg_id) AS total_buildings
FROM ${metadata_table} m
JOIN ${data_table} d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = '${state}';

-- label: buildings_by_group
-- description: Distinct buildings per building-type group
SELECT m.`in.comstock_building_type_group` AS building_type_group,
       COUNT(DISTINCT m.bldg_id) AS num_buildings
FROM ${metadata_table} m
JOIN ${data_table} d ON m.bldg_id = d.bldg_id_min
WHERE m.`in.state` = '${state}'
GROUP BY m.`in.comstock_building_type_group`;

-- label: top_buildings_per_group
-- description: Up to 500 buildings per building-type group
WITH joined AS (
  SELECT DISTINCT m.bldg_id, m.`in.comstock_building_type_group` AS grp
  FROM ${metadata_table} m
  JOIN ${data_table} d ON m.bldg_id = d.bldg_id_min
),
ranked AS (
  SELECT bldg_id, grp,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY bldg_id) AS rn
  FROM joined
)
SELECT bldg_id, grp, rn FROM ranked WHERE rn <= 500;
