# social recommenders registered here as they land
